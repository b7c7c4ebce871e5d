package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql}
import graft.operators.Chunker

/** Eighteenth curation batch: chunk-level dedup (the reference's R2
  * chunker feeding the dedup family — what an index store actually
  * saves) and NB margin calibration (is the classifier's confidence
  * predictive of correctness — the selective-classification curve).
  */
object CurationQueries18 {

  /** CHUNK DEDUP — exact dedup at the CHUNK granularity the reference
    * indexes (`cut_texts_in_subtexts`, load-texts.c:37-105): identical
    * chunks across documents need one embedding + one `.vdb` row, so
    * the dup share IS the index-store saving. Also reports cross-doc
    * hash collisions (chunks shared between DIFFERENT documents — the
    * boilerplate tier) and the characters a dedup'd store avoids
    * embedding. SCALE: chunk hashes are computed map-side and only
    * (hash, len) crosses the shuffle — chunk text never moves; one
    * hash-keyed agg then a 1-row fold, the q_dedup_exact shape on the
    * chunk axis.
    */
  val chunkDedup: QueryDef = QueryDef.sql(
    "q_chunk_dedup",
    s"""WITH RECURSIVE ${TextQueries.chunkCte(TextQueries.ChunkLen)},
       |h AS (SELECT doc_id, ${polyHashSql("chunk")} AS h, length(chunk) AS lc FROM chunks),
       |g AS (SELECT h, count(*) AS cnt, count(DISTINCT doc_id) AS nd, max(lc) AS lc
       |      FROM h GROUP BY h)
       |SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
       |       CAST(count(*) AS BIGINT) AS n_distinct,
       |       CAST(sum(cnt) - count(*) AS BIGINT) AS dup_chunks,
       |       CAST((sum(cnt) - count(*)) * 10000 // sum(cnt) AS BIGINT) AS dup_bp,
       |       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS cross_doc_hashes,
       |       CAST(sum((cnt - 1) * lc) AS BIGINT) AS saved_chars
       |FROM g""".stripMargin) { (spark, dir) =>
    val ch = Chunker.chunk(
        Tables(spark, dir, "documents").select("doc_id", "text"),
        "text", TextQueries.ChunkLen)
      .select(polyHash(col("chunk")).as("h"), col("doc_id"),
        length(col("chunk")).cast("long").as("lc"))
    ch.groupBy("h")
      .agg(count(lit(1)).as("cnt"), countDistinct("doc_id").as("nd"),
        max("lc").as("lc"))
      .agg(sum("cnt").as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        (sum("cnt") - count(lit(1))).as("dup_chunks"),
        expr("(sum(cnt) - count(*)) * 10000 DIV sum(cnt)").as("dup_bp"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("cross_doc_hashes"),
        sum((col("cnt") - 1) * col("lc")).as("saved_chars"))
  }

  /** NB MARGIN CALIBRATION — per confidence bin (top1-top2 score gap
    * in micro-nats, quarter-nat-wide bins capped at 19): held-out count and
    * accuracy. A calibrated classifier's accuracy rises with margin —
    * the curve that justifies margin-thresholded AUTO-labeling in a
    * curation pipeline (keep high-margin predictions, route the rest
    * to review). Bins are FIXED-width, not quantiles, so the
    * aggregation is map-side and scale-free (the corpus-wide ntile
    * this avoids is exactly the single-partition sort q_token_cdf had
    * to be rewritten away from). SCALE: rides `nbScores` (vocab-keyed
    * joins) plus a doc-keyed top-2 window and a 20-row aggregate.
    */
  val nbMargin: QueryDef = QueryDef.sql(
    "q_nb_margin",
    s"""WITH ${CurationQueries16.nbScoreCte},
       |r AS (SELECT doc_id, actual, c, score,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c ASC) AS rn
       |      FROM sc),
       |m AS (SELECT t1.doc_id, t1.actual, t1.c AS pred, t1.score - t2.score AS margin
       |      FROM r t1 JOIN r t2 ON t2.doc_id = t1.doc_id AND t1.rn = 1 AND t2.rn = 2),
       |b AS (SELECT least(margin // 250000, 19) AS bin, actual = pred AS ok FROM m)
       |SELECT CAST(bin AS BIGINT) AS bin,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS accuracy_bp
       |FROM b GROUP BY 1""".stripMargin) { (spark, dir) =>
    val wnd = Window.partitionBy("doc_id").orderBy(col("score").desc, col("c").asc)
    val r = CurationQueries16.nbScores(spark, dir)
      .withColumn("rn", row_number().over(wnd))
    // top1/top2 fold out of ONE doc-keyed aggregate over the rn<=2 rows
    // — the previous t1-join-t2 self-join replayed the entire nbScores
    // chain per side (guide §2.4). The inner join dropped docs lacking
    // an rn=2 row; the isNotNull filter preserves that contract.
    r.filter(col("rn") <= 2)
      .groupBy("doc_id")
      .agg(max(when(col("rn") === 1, col("actual"))).as("actual"),
        max(when(col("rn") === 1, col("c"))).as("pred"),
        max(when(col("rn") === 1, col("score"))).as("s1"),
        max(when(col("rn") === 2, col("score"))).as("s2"))
      .filter(col("s2").isNotNull)
      .select(expr("least((s1 - s2) DIV 250000, 19)").as("bin"),
        (col("actual") === col("pred")).as("ok"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_correct"),
        expr("sum(CASE WHEN ok THEN 1 ELSE 0 END) * 10000 DIV count(*)").as("accuracy_bp"))
  }

  val all: Seq[QueryDef] = Seq(chunkDedup, nbMargin)
}
