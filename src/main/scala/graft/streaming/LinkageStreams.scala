package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming record linkage — the incremental face of
  * `q_record_linkage`: records arrive as a stream, are routed to their
  * blocking key (nation × segment × 14-char name prefix), and each new
  * record is compared against that block's STANDING members; a
  * verified pair emits the moment its second member arrives. Batch
  * replay of the same records yields exactly the same pair set
  * (StreamingSpec pins it, across a mid-stream restart — a pair whose
  * first member arrived before the restart can only emit from
  * recovered block state).
  *
  * SCALE: state per block is its member list — Θ(block size), bounded
  * by the BLOCKING KEY design exactly like the batch join's pair mass
  * (the name-prefix component keeps blocks bounded at any N). The
  * TOTAL ledger is Θ(occupied blocks) — content-identity class under
  * the repo state-retention policy ([[StateTtl]]): unbounded on an
  * endless crawl, and the `idleTtl` recipe of
  * [[DedupStreams.nearDupCandidates]] applies verbatim when a
  * deployment needs the bound (contract weakens to pairs-within-a-
  * TTL-window the same way). The per-arrival cost is |block| banded
  * comparisons on the prefix-stripped remainders — the same
  * common-prefix-stripping argument as the batch form.
  */
object LinkageStreams {

  case class CustRecord(c_custkey: Long, c_name: String, c_nationkey: Int,
                        c_mktsegment: String, bal_cents: Long)
  case class LinkPair(key_a: Long, key_b: Long, name_dist: Long, bal_cents_diff: Long)
  case class BlockMembers(members: List[(Long, String, Long)])

  /** Banded Levenshtein on short strings: distance if ≤ maxDist, else -1.
    * (The inputs here are prefix-stripped remainders — a few chars.)
    */
  private[streaming] def boundedLev(a: String, b: String, maxDist: Int): Int = {
    if (math.abs(a.length - b.length) > maxDist) return -1
    var prev = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1)
      cur(0) = i
      var rowMin = cur(0)
      for (j <- 1 to b.length) {
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        rowMin = math.min(rowMin, cur(j))
      }
      if (rowMin > maxDist) return -1 // the whole band is past the threshold
      prev = cur
    }
    if (prev(b.length) <= maxDist) prev(b.length) else -1
  }

  /** Stream of records → stream of verified pairs (each exactly once,
    * key_a < key_b). `maxDist` matches the batch query's threshold.
    */
  def linkagePairs(records: Dataset[CustRecord], maxDist: Int = 2)
  : Dataset[LinkPair] = {
    import records.sparkSession.implicits._
    records
      .groupByKey(r => (r.c_nationkey, r.c_mktsegment, r.c_name.take(14)))
      .flatMapGroupsWithState[BlockMembers, LinkPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, batch: Iterator[CustRecord], state: GroupState[BlockMembers]) =>
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[LinkPair]
          // within a trigger the iterator is unordered; sort by key so
          // intra-batch pairs emit deterministically (once, min-first)
          batch.toArray.sortBy(_.c_custkey).foreach { r =>
            val suffix = r.c_name.drop(14)
            // a replayed/duplicate arrival of the same key must neither
            // match its own earlier copy (a (k,k) self-pair at distance 0
            // would break the batch contract key_a < key_b) nor re-enter
            // block state (which would double every later pair)
            if (!members.exists(_._1 == r.c_custkey)) {
              members.foreach { case (k, name, bal) =>
                val d = boundedLev(name.drop(14), suffix, maxDist)
                if (d >= 0)
                  out += LinkPair(math.min(k, r.c_custkey), math.max(k, r.c_custkey),
                    d.toLong, math.abs(bal - r.bal_cents))
              }
              members = (r.c_custkey, r.c_name, r.bal_cents) :: members
            }
          }
          state.update(BlockMembers(members))
          out.iterator
      }
  }
}
