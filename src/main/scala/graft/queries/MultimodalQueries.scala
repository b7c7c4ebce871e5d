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

  val all: Seq[QueryDef] = Seq(binaryMeta)
}
