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

  val all: Seq[QueryDef] = Seq(eventPivot)
}
