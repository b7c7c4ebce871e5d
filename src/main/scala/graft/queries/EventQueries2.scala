package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Second event batch: the ordered transition matrix. */
object EventQueries2 {

  /** EVENT TRANSITIONS — the first-order Markov matrix of user
    * behavior: per (event_type -> next event_type within the same
    * user's timeline), transition count and row-normalized probability
    * in bp. `q_event_itemsets` counts UNORDERED co-occurrence within a
    * session; this is the ORDERED complement (what follows what), the
    * input to next-event prediction and to funnel-shape sanity checks
    * (a purchase->view edge heavier than view->purchase flags timeline
    * corruption). Ordering is (ts, event_id) so ties are deterministic
    * on both engines. SCALE: one user-keyed lag window (co-partitioned
    * with the user shuffle) into a (types x types)-bounded aggregate;
    * probabilities come from a broadcast-sized row-total join.
    */
  val eventTransitions: QueryDef = QueryDef.sql(
    "q_event_transitions",
    """WITH s AS (SELECT user_id, event_type,
      |                 lead(event_type) OVER (PARTITION BY user_id
      |                                        ORDER BY ts, event_id) AS next_type
      |           FROM events),
      |t AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |r AS (SELECT from_type, sum(n) AS tot FROM t GROUP BY 1)
      |SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
      |       CAST(t.n * 10000 // r.tot AS BIGINT) AS p_bp
      |FROM t JOIN r ON r.from_type = t.from_type""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val t = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val r = t.groupBy("from_type").agg(sum("n").as("tot"))
    t.join(broadcast(r), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 10000 DIV tot").as("p_bp"))
  }

  val all: Seq[QueryDef] = Seq(eventTransitions)
}
