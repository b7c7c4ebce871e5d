package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions._
import graft.functions.HashExpressions.shingleHashesFast

/** Streaming near-duplicate detection — the streaming face of the batch
  * MinHash-LSH family ([[graft.operators.Dedup.lshCandidates]]), for
  * dedup-as-you-crawl pipelines.
  *
  * Signatures are MAP-ONLY here: the per-doc min over each permuted
  * shingle-hash set is computed with `array_min(transform(...))` on the
  * shingle-hash ARRAY (same codegen kernel, same integer algebra as the
  * batch `groupBy(min)` formulation — identical values by construction).
  * That leaves the band-bucket state as the query's ONLY stateful
  * operator, so the whole pipeline runs in plain append mode.
  *
  * State per occupied bucket = one long: the first doc to claim an LSH
  * band bucket anchors it; every later doc landing in the bucket emits
  * a candidate pair (doc, anchor). This is the unbounded-stream analog
  * of the batch banded equi-join — candidates only within buckets,
  * never all-pairs. A production deployment bounds state with
  * `GroupStateTimeout.ProcessingTimeTimeout` (expire buckets no crawl
  * shard has touched lately); the fixture tests keep NoTimeout.
  */
object DedupStreams {

  case class BandHit(band: Int, x: Long, y: Long, doc_id: Long)
  case class DupCandidate(doc_id: Long, anchor_id: Long, band: Int)

  /** (doc_id, text) → one row per LSH band key, map-only (no shuffle,
    * no aggregation): 8 minhash values folded over the shingle-hash
    * array, banded 4×2 exactly like the batch operator.
    */
  def bandKeys(docs: DataFrame): DataFrame = {
    val hashes = array_distinct(shingleHashesFast(tokens(col("text")), 3))
    val sig = MinhashSeeds.zipWithIndex.map { case ((a, b), j) =>
      array_min(transform(hashes, h => minhashPerm(h, a, b))).as(s"m$j")
    }
    docs
      .filter(size(tokens(col("text"))) >= 3) // < n tokens → no shingles, no signature
      .select(col("doc_id") +: sig: _*)
      .select(col("doc_id"), explode(array((0 until 4).map { bnd =>
        struct(lit(bnd).as("band"),
          col(s"m${2 * bnd}").as("x"), col(s"m${2 * bnd + 1}").as("y"))
      }: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.x").as("x"),
        col("bk.y").as("y"), col("doc_id"))
  }

  /** Streaming candidate pairs: (doc, anchor, band) in append mode.
    * A pair sharing several bands emits once per band — candidates feed
    * a verify stage (exact Jaccard / cosine), which dedups anyway.
    */
  def nearDupCandidates(docs: DataFrame): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    bandKeys(docs).as[BandHit]
      .groupByKey(h => (h.band, h.x, h.y))
      .flatMapGroupsWithState[Long, DupCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long, Long), hits: Iterator[BandHit], state: GroupState[Long]) =>
          val ids = hits.map(_.doc_id).toSeq.distinct.sorted
          val anchor = state.getOption.getOrElse { val a = ids.head; state.update(a); a }
          ids.filter(_ != anchor).map(d => DupCandidate(d, anchor, key._1)).iterator
      }
  }
}
