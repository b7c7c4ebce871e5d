package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream. The reference
  * has no data streams (SURVEY §2.2: its only "stream" is HTTP chunk
  * transport, `curl_helpers.c:28-67`), so this is pure north-star
  * surface: the same tumbling/session windows as the batch queries, plus
  * custom keyed state via mapGroupsWithState — the scalable analog of the
  * reference's driver-side conversation accumulator (`multirag.c:155-162`).
  *
  * All transforms are source-agnostic: pass any streaming (or batch)
  * DataFrame with (ts timestamp, user_id long, event_type string,
  * value double).
  */
object EventStreams {

  /** Tumbling 1-hour counts with a 2-hour watermark for late data. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** 30-minute-gap session aggregation (same operator family the batch
    * q_sessionize uses).
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))

  /** Streaming dedup: drop repeated event_ids within the watermark —
    * the streaming face of the batch dedup suite (state is bounded by
    * the watermark horizon, the scale requirement for infinite streams).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals via mapGroupsWithState.
    * Demonstrates the engine's arbitrary-stateful surface; state is a
    * simple running aggregate with processing-time timeout.
    */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val events = batch.toSeq
          val next = UserRunning(uid, prev.n_events + events.size,
            prev.total_value + events.map(_.value).sum)
          state.update(next)
          next
      }
  }

  /** Stream-static enrichment — the canonical dimension-join shape: the
    * static side is broadcast into every micro-batch (re-resolved per
    * batch, so dim updates between batches are picked up), and the
    * stream side keeps NO state — unlike a stream-stream join there is
    * no watermark or buffer, which is why this is the preferred form
    * whenever the dimension fits in memory.
    */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), "event_type")
}
