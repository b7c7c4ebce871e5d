package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Prompt, TopK}

/** The reference's query half (`multirag.c:394-456`): embed the user
  * query, brute-force top-k over the index, assemble the instruct prompt.
  * The LLM call itself stays outside the engine (`multirag.c:440-451` is
  * transport, not analytics).
  *
  * Per turn this is one Spark job: the k winners are tiny and collected
  * implicitly by the final single-row aggregation; the index itself is
  * never collected and should be `.persist`ed by the caller across REPL
  * turns (the scalable analog of the reference's all-in-RAM table,
  * `multirag.c:359`).
  */
object Rag {

  /** Embed one query text with the pipeline's embedder. */
  def embedQuery(spark: SparkSession, embedder: Embedder, text: String): Seq[Double] = {
    import spark.implicits._
    embedder.embed(Seq(text).toDF("q"), "q", "e")
      .head().getSeq[Double](1)
  }

  /** index(idCol, textCol, embCol) + query → 1-row (prompt) frame. */
  def answer(spark: SparkSession, index: DataFrame, idCol: String, textCol: String,
             embCol: String, embedder: Embedder, userInput: String,
             conversation: String, k: Int): DataFrame = {
    val qv = embedQuery(spark, embedder, userInput)
    // ranks are positions in (dist, id) order, assigned inside the
    // assembly fold — no window over the k-row top-k frame
    val topk = TopK.nearest(index, embCol, idCol, qv, k)
    Prompt.assembleByOrder(topk, Seq(col("dist"), col(idCol)), textCol,
      conversation, userInput)
  }
}
