package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions.polyHash

/** Streaming sketch maintenance — the unbounded-stream face of the
  * batch sketch queries (`q_hll_sketch` / `q_cms_sketch`). The batch
  * side proves the sketch math against the DuckDB oracle; this side
  * proves the MERGE property that makes the sketch fleet-scalable:
  * HLL registers update by pointwise max, which is commutative,
  * associative and idempotent, so ANY partitioning of the stream into
  * micro-batches (or executors, or Kafka partitions) yields the same
  * final registers as one batch pass — asserted literally in
  * StreamingSpec (streaming registers == batch registers).
  *
  * State per key = 256 ints FOREVER (one register array), never
  * stream-length — the bounded-state requirement for infinite streams.
  */
object SketchStreams {

  case class Register(event_type: String, idx: Int, m: Int)

  /** The q_hll_sketch hash algebra as columns: key = user@day,
    * square-mixed salted polyhashes for bucket (m=256) and rho
    * (leading-1 position in a 2^22 window). Exactly the batch
    * query's integers — the spec relies on this.
    */
  def hllPrep(events: DataFrame): DataFrame =
    hllCols(events, Nil)

  /** [[hllPrep]] with `event_id` carried through — the batch merge-law
    * query (`q_hll_merge`) splits registers by id parity.
    */
  def hllPrepWithId(events: DataFrame): DataFrame =
    hllCols(events, Seq(col("event_id")))

  private def hllCols(events: DataFrame,
                      extra: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val key = concat(col("user_id").cast("string"), lit("@"),
      date_format(col("ts"), "yyyy-MM-dd"))
    def sqMix(salt: String) = {
      val x = polyHash(concat(lit(salt), key))
      pmod(x * x, lit(1000000007L))
    }
    events.select(col("event_type") +: extra ++: Seq(
      pmod(sqMix("i#"), lit(256L)).cast("int").as("idx"),
      when(pmod(sqMix("r#"), lit(4194304L)) === 0, lit(23))
        .otherwise(lit(23) - length(bin(pmod(sqMix("r#"), lit(4194304L)))))
        .cast("int").as("rho")): _*)
  }

  /** Keyed HLL register maintenance: per event_type, fold each
    * micro-batch's (idx, rho) rows into the standing 256-register
    * array by pointwise max; emit the non-zero registers every batch
    * (Update mode — downstream reads the latest snapshot, or merges
    * snapshots from many streams by max again).
    */
  def hllRegisters(events: DataFrame): Dataset[Register] = {
    import events.sparkSession.implicits._
    hllPrep(events)
      .as[(String, Int, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Int], Register](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Int, Int)], state: GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(Array.fill(256)(0))
          rows.foreach { case (_, idx, rho) =>
            if (rho > regs(idx)) regs(idx) = rho
          }
          state.update(regs)
          regs.iterator.zipWithIndex
            .collect { case (m, i) if m > 0 => Register(key, i, m) }
      }
  }
}
