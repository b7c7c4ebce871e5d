package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Chunker

/** The reference's batch half (`build-vector-db-from-server.c:9-78`):
  * read → chunk → embed → write, as one declarative pipeline.
  *
  * Spark-first shape: chunking explodes inside the scan stage (no
  * shuffle), embedding is either pure expressions (mock) or a
  * per-partition HTTP client (`mapPartitions`), and the sink is
  * partitioned parquet — the reference's strictly-sequential
  * one-request-in-flight loop becomes the per-partition parallel region.
  * At 100 TB nothing here shuffles at all.
  */
object IndexBuild {

  /** docs(idCol, textCol) → (idCol, chunk_idx, chunk, embedding). */
  def build(docs: DataFrame, idCol: String, textCol: String,
            chunkLen: Int, embedder: Embedder): DataFrame = {
    val chunks = Chunker.chunk(docs.select(col(idCol), col(textCol)), textCol, chunkLen)
    embedder.embed(chunks, "chunk", "embedding")
  }

  /** Build and persist the index as parquet. */
  def run(docs: DataFrame, idCol: String, textCol: String,
          chunkLen: Int, embedder: Embedder, outPath: String): Unit =
    build(docs, idCol, textCol, chunkLen, embedder)
      .write.mode("overwrite").parquet(outPath)
}
