package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.AsOfJoin

/** As-of join over the events stream: for every click, the user's most
  * recent purchase at or before the click. The oracle is DuckDB's native
  * ASOF LEFT JOIN — the engine composes the same semantics from a union
  * + single window pass (one shuffle on user_id).
  */
object AsOfQueries {

  val clickLastPurchase: QueryDef = QueryDef.sql(
    "q_asof_join",
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id AS click_id,
      |       p.event_id AS purchase_id,
      |       p.value AS purchase_value
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    AsOfJoin.leftAsOf(clicks, purchases, "user_id", "ts", "ts",
        rightTieCols = Seq("event_id"))
      .select(col("event_id").as("click_id"),
        col("asof_event_id").as("purchase_id"),
        col("asof_value").as("purchase_value"))
  }

  val all: Seq[QueryDef] = Seq(clickLastPurchase)
}
