package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.tokens

/** Twenty-ninth batch: the NORMALIZED dedup tier (between exact and
  * fuzzy) and filter-agreement kappa (do two independent quality
  * filters measure the same thing, or just overlap by chance).
  */
object CurationQueries29 {

  /** NORMALIZED DEDUP — collapse after canonicalization (lowercase,
    * strip non-alphanumerics, squeeze whitespace): the tier that
    * catches case/punctuation re-encodings that exact dedup misses and
    * fuzzy tiers over-pay for. Reports how many additional groups
    * collapse beyond raw-exact — the marginal yield that decides
    * whether the normalization pass belongs in the pipeline. The
    * fixture is already canonical, so (the corpus_diff pattern) every
    * 13th document contributes an UPPERCASED+period variant — each
    * must collapse back onto its source under normalization, and the
    * spec pins extra_collapsed to exactly that count. SCALE:
    * one map-side canonicalization + one content-keyed shuffle (the
    * q_dedup_exact shape; the normalized key ships instead of raw
    * text, usually shorter).
    */
  val normDedup: QueryDef = QueryDef.sql(
    "q_norm_dedup",
    """WITH u AS (SELECT text FROM documents
      |           UNION ALL
      |           SELECT upper(text) || '.' AS text FROM documents WHERE doc_id % 13 = 0),
      |n AS (SELECT text,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |       '  +', ' ', 'g')) AS norm
      |  FROM u)
      |SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(DISTINCT text) AS BIGINT) AS n_raw_distinct,
      |       CAST(count(DISTINCT norm) AS BIGINT) AS n_norm_distinct,
      |       CAST(count(DISTINCT text) - count(DISTINCT norm) AS BIGINT) AS extra_collapsed,
      |       CAST((count(DISTINCT text) - count(DISTINCT norm)) * 10000
      |            // count(DISTINCT text) AS BIGINT) AS extra_bp
      |FROM n""".stripMargin) { (spark, dir) =>
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), lit("[^a-z0-9 ]"), lit("")),
      lit("  +"), lit(" ")))
    val docs = Tables(spark, dir, "documents")
    docs.select(col("text"))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(13L)) === 0)
        .select(concat(upper(col("text")), lit(".")).as("text")))
      .select(col("text"), norm.as("norm"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("text").as("n_raw_distinct"),
        countDistinct("norm").as("n_norm_distinct"))
      .select(col("n_docs"), col("n_raw_distinct"), col("n_norm_distinct"),
        (col("n_raw_distinct") - col("n_norm_distinct")).as("extra_collapsed"),
        expr("(n_raw_distinct - n_norm_distinct) * 10000 DIV n_raw_distinct")
          .as("extra_bp"))
  }

  /** FILTER AGREEMENT (Cohen's kappa) — `q_quality_filter`'s keep
    * verdict against `q_gopher_rules`' keep verdict, with the full
    * 2x2 agreement table and kappa in bp: observed agreement corrected
    * for the agreement two filters with these keep-rates would reach
    * by CHANCE. Near-zero kappa with high raw agreement means the
    * filters mostly agree because both keep (or drop) almost
    * everything — redundant gates; high kappa means they rank the same
    * documents as bad, so one can gate for the other in a cheaper
    * pass. All integer: kappa_bp = (po - pe) * 10000 / (1 - pe)
    * evaluated over n^2-scaled counts. Thresholds are the two
    * filters' own literals (drift = red oracle row). SCALE: two
    * token-stat aggregates over one scan + a 1-row fold.
    */
  val filterKappa: QueryDef = QueryDef.sql(
    "q_filter_kappa",
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |s AS (SELECT doc_id, count(*) AS n_words, sum(length(tok)) AS sum_len,
      |             count(*) FILTER (WHERE length(tok) <= 2) AS n_short,
      |             count(DISTINCT CASE WHEN tok IN ('the','a','of','to','and')
      |                                 THEN tok END) AS n_stop,
      |             count(DISTINCT tok) AS n_uniq,
      |             count(*) FILTER (WHERE tok IN ('a', 'the')) AS n_stop2
      |      FROM tk GROUP BY doc_id),
      |v AS (SELECT doc_id,
      |             (n_words BETWEEN 25 AND 80
      |              AND (sum_len * 100) // n_words BETWEEN 420 AND 560
      |              AND n_stop >= 2
      |              AND (n_short * 100) // n_words <= 6) AS g,
      |             (n_words >= 20
      |              AND CAST(floor(n_uniq * 10000.0 / n_words) AS BIGINT) >= 4000
      |              AND CAST(floor(n_stop2 * 10000.0 / n_words) AS BIGINT) <= 1000) AS q
      |      FROM s),
      |a AS (SELECT count(*) AS n,
      |             sum(CASE WHEN g AND q THEN 1 ELSE 0 END) AS kk,
      |             sum(CASE WHEN g AND NOT q THEN 1 ELSE 0 END) AS kd,
      |             sum(CASE WHEN NOT g AND q THEN 1 ELSE 0 END) AS dk,
      |             sum(CASE WHEN NOT g AND NOT q THEN 1 ELSE 0 END) AS dd
      |      FROM v)
      |SELECT CAST(n AS BIGINT) AS n_docs,
      |       CAST(kk AS BIGINT) AS both_keep, CAST(kd AS BIGINT) AS gopher_only,
      |       CAST(dk AS BIGINT) AS quality_only, CAST(dd AS BIGINT) AS both_drop,
      |       CAST((kk + dd) * 10000 // n AS BIGINT) AS agreement_bp,
      |       CAST(((kk + dd) * n - ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd))) * 10000
      |            // greatest(n * n - ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)), 1) AS BIGINT)
      |         AS kappa_bp
      |FROM a""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("tok"))).as("sum_len"),
        count(when(length(col("tok")) <= 2, 1)).as("n_short"),
        countDistinct(when(col("tok").isin("the", "a", "of", "to", "and"),
          col("tok"))).as("n_stop"),
        countDistinct("tok").as("n_uniq"),
        count(when(col("tok").isin("a", "the"), 1)).as("n_stop2"))
    val v = s.select(
      (col("n_words").between(25, 80) &&
        expr("sum_len * 100 DIV n_words").between(420, 560) &&
        col("n_stop") >= 2 &&
        expr("n_short * 100 DIV n_words") <= 6).as("g"),
      (col("n_words") >= 20 &&
        floor(col("n_uniq") * 10000.0 / col("n_words")).cast("long") >= 4000 &&
        floor(col("n_stop2") * 10000.0 / col("n_words")).cast("long") <= 1000).as("q"))
    v.agg(count(lit(1)).as("n"),
        sum(when(col("g") && col("q"), 1L).otherwise(0L)).as("kk"),
        sum(when(col("g") && !col("q"), 1L).otherwise(0L)).as("kd"),
        sum(when(!col("g") && col("q"), 1L).otherwise(0L)).as("dk"),
        sum(when(!col("g") && !col("q"), 1L).otherwise(0L)).as("dd"))
      .select(col("n").as("n_docs"),
        col("kk").as("both_keep"), col("kd").as("gopher_only"),
        col("dk").as("quality_only"), col("dd").as("both_drop"),
        expr("(kk + dd) * 10000 DIV n").as("agreement_bp"),
        expr("((kk + dd) * n - ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd))) * 10000" +
          " DIV greatest(n * n - ((kk + kd) * (kk + dk) + (dk + dd) * (kd + dd)), 1)")
          .as("kappa_bp"))
  }

  val all: Seq[QueryDef] = Seq(normDedup, filterKappa)
}
