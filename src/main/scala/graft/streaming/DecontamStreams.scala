package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashExpressions.shingleHashesFast

/** Streaming decontamination — the crawl-time face of the batch
  * decontam tiers (`q_decontam` / `q_winnow_decontam`): a STANDING
  * fingerprint index of the protected split (eval benchmarks, the test
  * fifth) is built in batch, and the incoming document stream is
  * checked against it in-flight, so contaminated pages are flagged
  * before they ever land in a training shard.
  *
  * Deployment shape: the index is CORPUS-sized (unlike the tokenizer
  * artifacts that ride the plan as literals), so the stream joins it —
  * a stream-static LEFT SEMI join in plain append mode: per-doc
  * 8-gram hashes are computed MAP-SIDE (codegen kernel, no explode
  * until the join key is needed), and the join emits the contamination
  * EVIDENCE rows (doc_id, shared fingerprint) with no state and no
  * watermark; `distinct doc_id` is a downstream consumer's one-line
  * rollup, kept out of the stream so the query stays stateless.
  * StreamingSpec pins the evidence rows row-for-row against the batch
  * twin over the same index. At 100 TB the static side is a parquet
  * table partitioned by hash — or, one tier cheaper, a bloom filter
  * built from it (`might_contain` map-side, exact-verify the hits
  * against this same join; the BloomFilterSpec machinery), trading
  * false-positive re-checks for never shuffling the stream.
  */
object DecontamStreams {

  /** Batch-built standing index: the distinct df-capped 8-gram hashes
    * present in the PROTECTED split (df cap over the whole corpus —
    * the `q_winnow_decontam` hot-shingle convention: boilerplate
    * n-grams shared by >64 docs are noise, not contamination).
    */
  def protectedIndex(docs: DataFrame, protectedPred: Column,
                     dfCap: Int = 64): DataFrame = {
    val rows = docs
      .select(col("doc_id"), explode(
        shingleHashesFast(split(col("text"), " "), 8)).as("h"))
    rows.groupBy("h")
      .agg(countDistinct("doc_id").as("dfh"),
        max(protectedPred.cast("int")).as("prot"))
      .filter(col("dfh") <= dfCap && col("prot") === 1)
      .select("h")
  }

  /** (doc_id, text) stream → (doc_id, h) contamination evidence: one
    * row per (document, shared fingerprint) hit against the standing
    * index. Map-side kernel + stream-static left-semi join; append
    * mode, stateless.
    */
  def contamHits(docs: DataFrame, index: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(
        shingleHashesFast(split(col("text"), " "), 8)).as("h"))
      .join(index, Seq("h"), "left_semi")
      .select(col("doc_id"), col("h"))
}
