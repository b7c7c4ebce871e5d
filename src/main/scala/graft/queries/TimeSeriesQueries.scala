package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Time-series shaping beyond plain tumbling windows: zero-filled
  * gap-fill against a generated spine, and a value-based (RANGE) trailing
  * interval window. Both are everyday ops in metrics/training-data
  * pipelines that plain `groupBy(window(...))` does not cover.
  */
object TimeSeriesQueries {

  /** Zero-filled hourly series per event type. The spine
    * (`sequence(lo, hi, 1 hour)` × distinct types) is generated, not
    * scanned, so the only full-data operation is the one aggregation
    * shuffle; the spine↔agg join runs entirely on post-aggregate (small)
    * frames and AQE broadcasts it. Missing (hour, type) cells surface as
    * explicit zero rows — the shape chart/model consumers need.
    */
  val gapFill: QueryDef = QueryDef.sql(
    "q_gapfill",
    """WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
      |                  date_trunc('hour', max(ts)) AS hi FROM events),
      |hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
      |types AS (SELECT DISTINCT event_type FROM events),
      |agg AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
      |               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |        FROM events GROUP BY 1, 2)
      |SELECT CAST(epoch(hours.h) AS BIGINT) AS hour_ts, types.event_type,
      |       coalesce(agg.n, 0) AS n,
      |       coalesce(agg.sum_value, 0.0) AS sum_value
      |FROM hours CROSS JOIN types
      |LEFT JOIN agg ON agg.h = hours.h AND agg.event_type = types.event_type""".stripMargin) {
    (spark, dir) =>
    val e = Tables.events(spark, dir)
    val bounds = e.agg(date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val hours = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val types = e.select("event_type").distinct()
    val agg = e
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // exact decimal internally, DOUBLE in the output schema
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    hours.crossJoin(types)
      .join(agg, Seq("h", "event_type"), "left")
      .select(unix_timestamp(col("h")).as("hour_ts"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** Trailing-1-hour count/sum per user at every event — a value-based
    * RANGE frame over epoch microseconds (`unix_micros` ≡ DuckDB
    * `epoch_us`, both exactly the ns→µs truncation of the source). RANGE
    * frames are peer-inclusive in both engines, so equal-timestamp rows
    * agree by definition; no tie-break is needed for determinism.
    */
  val rollingHour: QueryDef = QueryDef.sql(
    "q_rolling_time",
    """SELECT event_id, user_id,
      |       count(*) OVER w AS n_1h,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin) {
    (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double").as("sum_1h"))
  }

  val all: Seq[QueryDef] = Seq(gapFill, rollingHour)
}
