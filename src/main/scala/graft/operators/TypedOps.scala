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
}
