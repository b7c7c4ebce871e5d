package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Pivot / relationalization: per-user event-type counts as columns.
  * The pivot value list is explicit (deterministic schema — at scale an
  * inferred pivot would need an extra distinct pass); the oracle uses
  * the ANSI CASE-sum formulation of the same table.
  */
object PivotQueries {

  private val Types = Seq("click", "view", "purchase", "signup", "error")

  val eventPivot: QueryDef = QueryDef.sql(
    "q_pivot", {
      val cases = Types.map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
        .mkString(",\n       ")
      s"""SELECT user_id,
         |       $cases
         |FROM events GROUP BY user_id""".stripMargin
    }) { (spark, dir) =>
    val pivoted = Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Types)
      .agg(count(lit(1)))
    pivoted.select(col("user_id") +: Types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** The inverse op: a wide per-flag aggregate melted to long form via
    * `Dataset.unpivot` (Spark's native melt — one generated projection,
    * no join). Measures are BIGINT so the shared value column needs no
    * lossy common-type promotion.
    */
  val unpivot: QueryDef = QueryDef.sql(
    "q_unpivot",
    """WITH wide AS (
      |  SELECT l_returnflag, count(*) AS n_items,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, measure, value FROM wide
      |UNPIVOT (value FOR measure IN (n_items, sum_qty, n_orders))""".stripMargin) {
    (spark, dir) =>
    val wide = Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("n_items"), col("sum_qty"), col("n_orders")),
      "measure", "value")
  }

  val all: Seq[QueryDef] = Seq(eventPivot, unpivot)
}
