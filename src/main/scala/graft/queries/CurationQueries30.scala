package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.tokens

/** Thirtieth batch: quality-feature confounding audit. */
object CurationQueries30 {

  /** LENGTH-QUALITY CORRELATION — Pearson r (bp) between document
    * length and each quality feature (distinct-token diversity,
    * stopword rate): the audit for the best-known quality-classifier
    * pitfall, a "quality" score that is secretly a length detector.
    * |r| near 10000 on the diversity axis means the filter's diversity
    * gate and a trivial length cutoff select nearly the same corpus —
    * in which case ship the cheap gate and drop the expensive one.
    * All moment sums are exact integers (counts and bp values; no
    * quantization grid needed), and only the final r normalization
    * touches doubles, with the identical expression on both engines.
    * SCALE: one token-stats aggregate into a 1-row integer fold.
    */
  val lenQualityCorr: QueryDef = QueryDef.sql(
    "q_len_quality_corr",
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |s AS (SELECT doc_id, count(*) AS x,
      |             count(DISTINCT tok) * 10000 // count(*) AS u,
      |             count(*) FILTER (WHERE tok IN ('a', 'the')) * 10000 // count(*) AS st
      |      FROM tk GROUP BY doc_id),
      |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(u) AS su, sum(st) AS sst,
      |             sum(x * x) AS sxx, sum(u * u) AS suu, sum(st * st) AS sstst,
      |             sum(x * u) AS sxu, sum(x * st) AS sxst
      |      FROM s)
      |SELECT CAST(n AS BIGINT) AS n_docs,
      |       CAST(floor((n * sxu - sx * su) * 10000.0 /
      |            sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * suu - su * su AS DOUBLE)))
      |            AS BIGINT) AS r_len_diversity_bp,
      |       CAST(floor((n * sxst - sx * sst) * 10000.0 /
      |            sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * sstst - sst * sst AS DOUBLE)))
      |            AS BIGINT) AS r_len_stopword_bp
      |FROM m""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("x"),
        expr("count(DISTINCT tok) * 10000 DIV count(*)").as("u"),
        expr("count(CASE WHEN tok IN ('a', 'the') THEN 1 END) * 10000 DIV count(*)")
          .as("st"))
    s.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("u").as("su"),
        sum("st").as("sst"),
        sum(col("x") * col("x")).as("sxx"), sum(col("u") * col("u")).as("suu"),
        sum(col("st") * col("st")).as("sstst"),
        sum(col("x") * col("u")).as("sxu"), sum(col("x") * col("st")).as("sxst"))
      .select(col("n").as("n_docs"),
        floor((col("n") * col("sxu") - col("sx") * col("su")) * lit(10000.0) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("suu") - col("su") * col("su")).cast("double")))
          .cast("long").as("r_len_diversity_bp"),
        floor((col("n") * col("sxst") - col("sx") * col("sst")) * lit(10000.0) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("sstst") - col("sst") * col("sst")).cast("double")))
          .cast("long").as("r_len_stopword_bp"))
  }

  /** CONDITIONAL BIGRAM ENTROPY — H(next | current) and the marginal
    * H(next) over within-document adjacent token pairs, Q20 fixed
    * point via the `q_char_entropy` per-term ln quantization — at Q30,
    * not Q40: per-term sums scale as N*|ln p|*grid and a Q40 grid
    * would overflow a long near 10^8 bigrams (the q_embed_anisotropy
    * overflow lesson applied at design time). Their
    * difference is the mutual information the previous token carries
    * about the next — the corpus-structure number that separates
    * natural text (low conditional entropy: syntax constrains the next
    * token) from shuffled or templated streams, and the
    * model-free lower-bound companion to the fitted LMs
    * (`q_bigram_lm`, `q_kneser_ney`). SCALE: one bigram-keyed count
    * (vocabulary^2-bounded, Zipf-sparse in practice) + a predecessor
    * rollup; the entropy fold is a sum over the count table, never the
    * corpus.
    */
  val bigramCondEntropy: QueryDef = QueryDef.sql(
    "q_bigram_centropy",
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (SELECT toks[i] AS a, toks[i + 1] AS b
      |       FROM tk, unnest(range(1, greatest(len(toks), 1))) t(i)),
      |cab AS (SELECT a, b, count(*) AS c FROM bg GROUP BY 1, 2),
      |ca AS (SELECT a, sum(c) AS ca FROM cab GROUP BY 1),
      |cb AS (SELECT b, sum(c) AS cb FROM cab GROUP BY 1),
      |n AS (SELECT sum(c) AS n FROM cab),
      |hc AS (SELECT -sum(cab.c * CAST(floor(ln(CAST(cab.c AS DOUBLE) / CAST(ca.ca AS DOUBLE))
      |                                      * 1073741824.0) AS BIGINT)) AS s
      |       FROM cab JOIN ca ON ca.a = cab.a),
      |hm AS (SELECT -sum(cb.cb * CAST(floor(ln(CAST(cb.cb AS DOUBLE) / CAST(n.n AS DOUBLE))
      |                                     * 1073741824.0) AS BIGINT)) AS s
      |       FROM cb, n)
      |SELECT CAST(n.n AS BIGINT) AS n_bigrams,
      |       CAST((SELECT count(*) FROM cab) AS BIGINT) AS n_types,
      |       CAST(hc.s // n.n // 1024 AS BIGINT) AS h_cond_q20,
      |       CAST(hm.s // n.n // 1024 AS BIGINT) AS h_marginal_q20,
      |       CAST((hm.s // n.n - hc.s // n.n) // 1024 AS BIGINT) AS mi_q20
      |FROM hc, hm, n""".stripMargin) { (spark, dir) =>
    val Q30 = 1073741824.0
    val bg = Tables(spark, dir, "documents")
      .select(tokens(col("text")).as("toks"))
      .select(explode(expr(
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), i -> struct(toks[i - 1] AS a, toks[i] AS b)) ELSE array() END"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cab = bg.groupBy("a", "b").agg(count(lit(1)).as("c")).localCheckpoint()
    val ca = cab.groupBy("a").agg(sum("c").as("ca"))
    val cb = cab.groupBy("b").agg(sum("c").as("cb"))
    val n = cab.agg(sum("c").as("n"))
    val types = cab.agg(count(lit(1)).as("n_types"))
    val hc = cab.join(ca, "a")
      .agg((-sum(col("c") * floor(log(col("c").cast("double") / col("ca").cast("double"))
        * lit(Q30)).cast("long"))).as("s"))
    val hm = cb.crossJoin(broadcast(n.select(col("n").as("nn"))))
      .agg((-sum(col("cb") * floor(log(col("cb").cast("double") / col("nn").cast("double"))
        * lit(Q30)).cast("long"))).as("s"))
    n.crossJoin(broadcast(types))
      .crossJoin(broadcast(hc.select(col("s").as("sc"))))
      .crossJoin(broadcast(hm.select(col("s").as("sm"))))
      .select(col("n").as("n_bigrams"), col("n_types"),
        expr("sc DIV n DIV 1024").as("h_cond_q20"),
        expr("sm DIV n DIV 1024").as("h_marginal_q20"),
        expr("(sm DIV n - sc DIV n) DIV 1024").as("mi_q20"))
  }

  val all: Seq[QueryDef] = Seq(lenQualityCorr, bigramCondEntropy)
}
