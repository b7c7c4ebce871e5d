package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Seventh curation batch: sparse-vector (TF-IDF) near-duplicate pairs —
  * the lexical complement of the dense `q_embed_neardup` family — and
  * per-domain quality-threshold calibration, the measurement behind "a
  * single global quality cutoff biases the mix against whole domains".
  */
object CurationQueries7 {

  /** Sparse TF-IDF cosine near-duplicate pairs via a df-capped postings
    * self-join — the classic lexical near-dup detector (cosine over
    * tf·idf term vectors), built the only way that survives scale:
    * pairs are generated ONLY through shared terms with document
    * frequency in [2, 64], never all-pairs. df = 1 terms cannot form a
    * pair (dropped before the join); df > 64 terms are the corpus-hot
    * vocabulary whose pair fan-out is quadratic in df and whose idf
    * weight is lowest — the same hot-key cap as `q_ngram_jaccard` /
    * `q_containment` (cap mirrored in both engines, so the METRIC is
    * "capped-vocabulary TF-IDF cosine", identically defined).
    *
    * Determinism discipline: weights w = tf·ln(nd/df) are doubles (ln
    * is the one libm call — absorbed by floor-quantization, the
    * `q_keywords` idiom). The per-doc norm accumulates
    * floor(w²·2^20) as exact BIGINTs; each kept posting is then
    * L2-NORMALIZED and floored onto a 2^10 grid (wq ≤ 1024), so the
    * pair dot product sum(wq_a·wq_b) is exact integer arithmetic —
    * order-independent, ≤ 2^20 per shared term, overflow-free to ~2^43
    * shared terms. dot_q ≈ cosine·2^20; the ship gate is the integer
    * comparison dot_q ≥ 2^19 (cosine ≳ 0.5).
    *
    * SCALE: two corpus-shaped shuffles (tf, df) + one equi-join on the
    * capped term key. Per-term pair fan-out ≤ C(64,2); candidate mass
    * grows linearly with vocabulary, never quadratically with corpus.
    */
  val tfidfNeardup: QueryDef = QueryDef.sql(
    "q_tfidf_neardup",
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
      |dfr AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1
      |        HAVING count(DISTINCT doc_id) BETWEEN 2 AND 64),
      |n AS (SELECT count(*) AS nd FROM documents),
      |w AS (SELECT tf.doc_id, tf.tok,
      |             CAST(tf.tf AS DOUBLE) * ln(CAST(n.nd AS DOUBLE) / CAST(dfr.df AS DOUBLE)) AS w
      |      FROM tf JOIN dfr USING (tok), n),
      |nm AS (SELECT doc_id,
      |              CAST(sum(CAST(floor(w * w * 1048576.0) AS BIGINT)) AS BIGINT) AS n2
      |       FROM w GROUP BY 1),
      |wn AS (SELECT w.doc_id, w.tok,
      |              CAST(floor(w.w * 1024.0 / sqrt(CAST(nm.n2 AS DOUBLE) / 1048576.0)) AS BIGINT) AS wq
      |       FROM w JOIN nm USING (doc_id) WHERE nm.n2 > 0),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |              CAST(sum(a.wq * b.wq) AS BIGINT) AS dot_q,
      |              CAST(count(*) AS BIGINT) AS n_shared
      |       FROM wn a JOIN wn b ON b.tok = a.tok AND b.doc_id > a.doc_id
      |       GROUP BY 1, 2)
      |SELECT doc_a, doc_b, dot_q, n_shared FROM pr WHERE dot_q >= 524288""".stripMargin) {
    (spark, dir) =>
      val docs = Tables(spark, dir, "documents")
      val tk = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val tf = tk.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfr = tk.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 64))
      val nd = docs.agg(count(lit(1)).as("nd"))
      val w = tf.join(dfr, "tok").crossJoin(broadcast(nd))
        .select(col("doc_id"), col("tok"),
          (col("tf").cast("double")
            * log(col("nd").cast("double") / col("df").cast("double"))).as("w"))
      val nm = w.groupBy("doc_id")
        .agg(sum(floor(col("w") * col("w") * 1048576.0).cast("long")).as("n2"))
        .filter(col("n2") > 0)
      val wn = w.join(nm, "doc_id")
        .select(col("doc_id"), col("tok"),
          floor(col("w") * 1024.0 / sqrt(col("n2").cast("double") / 1048576.0))
            .cast("long").as("wq"))
      val a = wn.select(col("doc_id").as("doc_a"), col("tok"), col("wq").as("wa"))
      val b = wn.select(col("doc_id").as("doc_b"), col("tok").as("btok"), col("wq").as("wb"))
      a.join(b, col("btok") === col("tok") && col("doc_b") > col("doc_a"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(col("wa") * col("wb")).as("dot_q"), count(lit(1)).as("n_shared"))
        .filter(col("dot_q") >= 524288L)
  }

  /** Per-domain quality-threshold calibration: the exact nearest-rank
    * p10 of the lexical-diversity score (uniq_bp, the `q_quality_filter`
    * signal) computed GLOBALLY and PER SOURCE, with each source's doc
    * count under both cutoffs. The report quantifies the domain bias of
    * one global threshold — a source whose kept_global is far below
    * 90% of n_docs is being drained by other domains' score
    * distribution, the thing per-domain calibration fixes.
    *
    * SCALE: no corpus-sized window anywhere (the `q_token_cdf` lesson
    * applied at design time, not retrofitted). uniq_bp lives on the
    * bounded [0, 10000] integer grid, so both thresholds come from
    * HISTOGRAMS: group to ≤ 10001 (global) / ≤ sources x 10001 (local)
    * rows, cumulative-sum the histogram, take the first bin where
    * 10·cum ≥ n (exactly the nearest-rank ceil(n/10) order statistic —
    * integer arithmetic, no doubles). The per-doc pass is map-side;
    * the windows run over broadcast-sized histograms.
    */
  val qualityCalibration: QueryDef = QueryDef.sql(
    "q_quality_calibration",
    """WITH m AS (SELECT doc_id, source,
      |                  CAST(floor(len(list_distinct(string_split(text, ' '))) * 10000.0
      |                             / len(string_split(text, ' '))) AS BIGINT) AS uniq_bp
      |           FROM documents),
      |gh AS (SELECT uniq_bp, count(*) AS c FROM m GROUP BY 1),
      |gn AS (SELECT sum(c) AS n FROM gh),
      |gthr AS (SELECT min(uniq_bp) AS thr_global FROM (
      |           SELECT uniq_bp, sum(c) OVER (ORDER BY uniq_bp) AS cum, gn.n
      |           FROM gh, gn) WHERE cum * 10 >= n),
      |lh AS (SELECT source, uniq_bp, count(*) AS c FROM m GROUP BY 1, 2),
      |lnn AS (SELECT source, sum(c) AS n FROM lh GROUP BY 1),
      |lthr AS (SELECT source, min(uniq_bp) AS thr_local FROM (
      |           SELECT lh.source, lh.uniq_bp,
      |                  sum(lh.c) OVER (PARTITION BY lh.source ORDER BY lh.uniq_bp) AS cum,
      |                  lnn.n
      |           FROM lh JOIN lnn USING (source)) WHERE cum * 10 >= n
      |         GROUP BY source)
      |SELECT m.source, CAST(count(*) AS BIGINT) AS n_docs,
      |       g.thr_global, l.thr_local,
      |       CAST(count(CASE WHEN m.uniq_bp >= g.thr_global THEN 1 END) AS BIGINT) AS kept_global,
      |       CAST(count(CASE WHEN m.uniq_bp >= l.thr_local THEN 1 END) AS BIGINT) AS kept_local
      |FROM m, gthr g
      |JOIN lthr l ON l.source = m.source
      |GROUP BY m.source, g.thr_global, l.thr_local""".stripMargin) { (spark, dir) =>
    val toks = split(col("text"), " ")
    val m = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        floor(size(array_distinct(toks)) * 10000.0 / size(toks)).cast("long").as("uniq_bp"))
    val gh = m.groupBy("uniq_bp").agg(count(lit(1)).as("c"))
    val gn = gh.agg(sum(col("c")).as("n"))
    // the window runs over the <=10001-row histogram, never the corpus
    val gthr = gh.crossJoin(broadcast(gn))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("uniq_bp"))))
      .filter(col("cum") * 10 >= col("n"))
      .agg(min(col("uniq_bp")).as("thr_global"))
    val lh = m.groupBy("source", "uniq_bp").agg(count(lit(1)).as("c"))
    val lnn = lh.groupBy("source").agg(sum(col("c")).as("n"))
    val lthr = lh.join(lnn, "source")
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("source")).orderBy(col("uniq_bp"))))
      .filter(col("cum") * 10 >= col("n"))
      .groupBy("source").agg(min(col("uniq_bp")).as("thr_local"))
    m.crossJoin(broadcast(gthr))
      .join(broadcast(lthr), "source")
      .groupBy("source", "thr_global", "thr_local")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("uniq_bp") >= col("thr_global"), 1)).as("kept_global"),
        count(when(col("uniq_bp") >= col("thr_local"), 1)).as("kept_local"))
      .select(col("source"), col("n_docs"), col("thr_global"), col("thr_local"),
        col("kept_global"), col("kept_local"))
  }

  /** Epoch planning under a token budget: allocate a 1M-token training
    * budget across sources by the sqrt-temperature weights of
    * `q_temperature_mix` (computed on TOKENS, not docs), and report the
    * implied repeat factor — how many epochs of each source the budget
    * buys (epochs_centi = 100·alloc/tokens; > 100 means the source is
    * repeated, the small-but-high-weight-domain regime). One per-source
    * aggregate plus broadcast totals: the plan is `q_temperature_mix`'s,
    * invariant to corpus scale past the first agg. The one double sqrt
    * is floor-absorbed onto the 2^20 grid (the shared idiom), all
    * downstream arithmetic exact integers.
    */
  val epochPlan: QueryDef = QueryDef.sql(
    "q_epoch_plan",
    """WITH s AS (SELECT source,
      |                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |          FROM documents GROUP BY source),
      |w AS (SELECT source, tokens,
      |             CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1048576.0) AS BIGINT) AS wq
      |      FROM s),
      |t AS (SELECT CAST(sum(wq) AS BIGINT) AS wtot FROM w)
      |SELECT w.source, w.tokens,
      |       CAST(w.wq * 1000000 // t.wtot AS BIGINT) AS alloc_tokens,
      |       CAST((w.wq * 1000000 // t.wtot) * 100 // w.tokens AS BIGINT) AS epochs_centi
      |FROM w, t""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
    val w = s.select(col("source"), col("tokens"),
      floor(sqrt(col("tokens").cast("double")) * 1048576.0).cast("long").as("wq"))
    val t = w.agg(sum(col("wq")).as("wtot"))
    w.crossJoin(broadcast(t))
      // integral DIV on both sides (DuckDB `//`): exact at any scale,
      // never a truncated double quotient
      .select(col("source"), col("tokens"),
        expr("wq * 1000000 DIV wtot").as("alloc_tokens"),
        expr("(wq * 1000000 DIV wtot) * 100 DIV tokens").as("epochs_centi"))
  }

  val all: Seq[QueryDef] = Seq(tfidfNeardup, qualityCalibration, epochPlan)
}
