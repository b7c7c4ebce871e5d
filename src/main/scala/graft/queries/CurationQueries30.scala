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

  val all: Seq[QueryDef] = Seq(lenQualityCorr)
}
