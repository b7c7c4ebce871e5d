package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal

/** Binary-column metadata surface: documents wrapped as opaque media
  * blobs, content-addressed (md5) and sized — the SQL-checkable part of
  * the multimodal plumbing (feature extraction itself is stubbed, see
  * [[graft.multimodal.Multimodal]]).
  */
object MultimodalQueries {

  val binaryMeta: QueryDef = QueryDef.sql(
    "q_binary_meta",
    """SELECT doc_id AS media_id, md5(text) AS content_md5,
      |       octet_length(CAST(text AS BLOB)) AS n_bytes
      |FROM documents""".stripMargin) { (spark, dir) =>
    Multimodal.fromText(Tables(spark, dir, "documents"), "doc_id", "text")
      .select(col("media_id"), md5(col("bytes")).as("content_md5"),
        col("meta.n_bytes").as("n_bytes"))
  }

  /** Featurization batch planning over the media table — the batch-shape
    * computation that precedes a `mapInPandas`-style decode pass: blobs
    * grouped into width-128-byte size buckets, each bucket reporting item
    * count, payload volume, and how many 64 KB featurize batches that
    * volume fills (`ceil` via integral arithmetic — the `q_packing_waste`
    * idiom on the byte axis). Size-bucketed batching is what keeps GPU
    * featurize batches shape-uniform (decode cost tracks payload size).
    * Map-only measure + bucket-bounded aggregate; blobs themselves never
    * shuffle — only (bucket, n_bytes) longs leave the scan.
    */
  val mediaBatches: QueryDef = QueryDef.sql(
    "q_media_batches",
    """WITH m AS (SELECT octet_length(CAST(text AS BLOB)) AS n_bytes FROM documents),
      |b AS (SELECT CAST(n_bytes // 128 AS BIGINT) AS bucket,
      |             CAST(count(*) AS BIGINT) AS n_items,
      |             CAST(sum(n_bytes) AS BIGINT) AS total_bytes
      |      FROM m GROUP BY 1)
      |SELECT bucket, n_items, total_bytes,
      |       CAST((total_bytes + 65535) // 65536 AS BIGINT) AS n_batches
      |FROM b""".stripMargin) { (spark, dir) =>
    Multimodal.fromText(Tables(spark, dir, "documents"), "doc_id", "text")
      .select(col("meta.n_bytes").as("n_bytes"))
      .groupBy(expr("n_bytes DIV 128").as("bucket"))
      .agg(count(lit(1)).as("n_items"), sum(col("n_bytes")).as("total_bytes"))
      .select(col("bucket"), col("n_items"), col("total_bytes"),
        expr("(total_bytes + 65535) DIV 65536").as("n_batches"))
  }

  val all: Seq[QueryDef] = Seq(binaryMeta, mediaBatches)
}
