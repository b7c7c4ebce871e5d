package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access. All queries take an sf directory and read the
  * driver's parquet tables from it (TESTDATA.md). Embeddings are stored as
  * `array<float>`; the engine works in `array<double>` to match the
  * reference's `DOUBLE_VECTOR` semantics (`vector-db.h:1`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** embeddings with the vector cast to array<double>. */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"), col("label"))

  /** events, with `ts` normalized to TimestampType regardless of how the
    * driver encoded the parquet column — the fixture has drifted across
    * rounds (TIMESTAMP(NANOS) → `timestamp[us]` no-tz, which Spark 4 reads
    * as TIMESTAMP_NTZ), and every downstream consumer (`unix_micros`,
    * `withWatermark`) requires TIMESTAMP. The NTZ→TIMESTAMP cast is
    * value-preserving under the UTC session the harness sets, matching
    * what DuckDB sees on the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long source
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already a (µs) TIMESTAMP, e.g. re-encoded replicas
    }
  }
}
