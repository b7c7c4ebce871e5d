package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.TopK

/** Vector-search queries over the `embeddings` fixture: the reference's
  * retrieval surface (brute-force cosine top-k, `vector-db.c:148-177`)
  * re-expressed Spark-first.
  */
object VectorQueries {

  /** The query vector: row vec_id=0, collected once (a single tiny row —
    * the only driver-side materialization; the scan side never collects).
    */
  private def queryVec(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Double] =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0)
      .head()
      .getSeq[Double](1)

  val topkCosine: QueryDef = QueryDef.sql(
    "q_topk_cosine",
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |       round(1 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS dist
      |FROM embeddings, q
      |ORDER BY 1 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), vec_id
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    val q = queryVec(spark, dir)
    TopK.nearest(Tables.embeddings(spark, dir), "embedding", "vec_id", q, 10)
      .select(col("vec_id"), round(col("dist"), 6).as("dist"))
  }

  val all: Seq[QueryDef] = Seq(topkCosine)
}
