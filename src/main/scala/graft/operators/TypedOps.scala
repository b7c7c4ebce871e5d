package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset surface: custom aggregators (the UDAF shape the
  * reference's function-pointer extension point implies, SURVEY §2.2).
  */
object TypedOps {

  case class Scored(id: Long, dist: Double)

  /** Bounded top-k (smallest dist, id tie-break) as an `Aggregator` — the
    * typed analog of `TakeOrderedAndProject`'s per-partition heap: the
    * buffer never exceeds k elements, merge is associative, so partial
    * aggregation keeps the shuffle at k rows per partition.
    */
  class TopKAggregator(k: Int) extends Aggregator[Scored, List[Scored], List[Scored]] {
    private val ord = Ordering.by[Scored, (Double, Long)](s => (s.dist, s.id))
    private def bound(l: List[Scored]): List[Scored] = l.sorted(ord).take(k)
    def zero: List[Scored] = Nil
    def reduce(b: List[Scored], a: Scored): List[Scored] = bound(a :: b)
    def merge(x: List[Scored], y: List[Scored]): List[Scored] = bound(x ++ y)
    def finish(r: List[Scored]): List[Scored] = r.sorted(ord)
    def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    def outputEncoder: Encoder[List[Scored]] = bufferEncoder
  }

  /** Gram-matrix moment accumulator over quantized embedding vectors:
    * one pass collects n, per-dim sums, per-dim square sums and ALL
    * upper-triangle cross sums into a single flat Long buffer —
    * the classic treeAggregate covariance shape. The point is the
    * SHUFFLE: partial buffers are ~(d²/2 + 2d + 1) longs per partition
    * (17 KB at d=64) instead of d²/2 exploded rows per INPUT row, so
    * the pass stays scan-bound at any corpus size. Integer sums ⇒
    * order-independent ⇒ re-shard deterministic.
    *
    * Buffer layout (0-based): [0] n; [1+i] Σx_i; [1+d+i] Σx_i²;
    * [1+2d + triOffset(i) + (j-i-1)] Σx_i·x_j for i<j, where
    * triOffset(i) = i·(2d-i-1)/2.
    */
  class GramAggregator(d: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val size = 1 + 2 * d + d * (d - 1) / 2
    def zero: Array[Long] = new Array[Long](size)
    def reduce(b: Array[Long], x: Array[Long]): Array[Long] = {
      b(0) += 1L
      var i = 0
      var t = 1 + 2 * d
      while (i < d) {
        val xi = x(i)
        b(1 + i) += xi
        b(1 + d + i) += xi * xi
        var j = i + 1
        while (j < d) { b(t) += xi * x(j); j += 1; t += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < size) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  case class Capped(n: Long, ids: List[Long])

  /** Skew-bounded id collector: exact group count plus AT MOST cap+1
    * collected ids. The point is the df-cap fusion in
    * [[Dedup.ngramJaccardPairs]]: a plain `collect_list` + post-filter
    * would buffer a hot shingle's ENTIRE posting list (a corpus-stopword
    * shingle can appear in a constant fraction of all documents) before
    * the cap discards it — the exact OOM the old hot-key anti-join
    * pre-pass existed to prevent. Here the buffer stops growing at
    * cap+1 elements while `n` keeps exact count, so groups with n ≤ cap
    * carry their complete id set and hot groups carry O(cap) bytes —
    * partial buffers are ≤ (cap+1) longs for ANY input skew. Collected
    * order is arrival order, but every consumer treats ids as a SET
    * (the pair kernel sorts; cardinality counts), so output is
    * re-shard deterministic.
    */
  class CappedCollectAggregator(cap: Int) extends Aggregator[Long, Capped, Capped] {
    def zero: Capped = Capped(0L, Nil)
    def reduce(b: Capped, id: Long): Capped =
      // before overflow n == ids.length, so this is an O(1) bound check
      Capped(b.n + 1, if (b.n <= cap) id :: b.ids else b.ids)
    def merge(a: Capped, b: Capped): Capped =
      Capped(a.n + b.n, if (a.ids.isEmpty) b.ids
        else if (b.ids.isEmpty) a.ids
        else (a.ids ::: b.ids).take(cap + 1))
    def finish(r: Capped): Capped = r
    def bufferEncoder: Encoder[Capped] = Encoders.product[Capped]
    def outputEncoder: Encoder[Capped] = Encoders.product[Capped]
  }
}
