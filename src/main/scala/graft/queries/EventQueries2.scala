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

  /** AUDIENCE OVERLAP — per event-type pair: shared distinct users,
    * each side's audience size, and audience Jaccard in bp. The
    * corpus-level complement of `q_event_itemsets` (which counts
    * within-session baskets): this answers "do the people who do X
    * also do Y at all", the segmentation number behind cross-feature
    * funnels. SCALE: one distinct (user, type) shuffle; the pair join
    * fans out <= C(|types|, 2) rows per user; everything after is a
    * types^2-bounded aggregate.
    */
  val audienceOverlap: QueryDef = QueryDef.sql(
    "q_audience_overlap",
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |ts AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
      |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS i
      |      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |      GROUP BY 1, 2)
      |SELECT p.type_a, p.type_b, CAST(p.i AS BIGINT) AS n_shared,
      |       CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
      |       CAST(p.i * 10000 // (ta.n + tb.n - p.i) AS BIGINT) AS jaccard_bp
      |FROM p JOIN ts ta ON ta.event_type = p.type_a
      |       JOIN ts tb ON tb.event_type = p.type_b""".stripMargin) { (spark, dir) =>
    val ut = Tables.events(spark, dir)
      .select("user_id", "event_type").distinct()
    val ts = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val a = ut.select(col("user_id"), col("event_type").as("type_a"))
    val b = ut.select(col("user_id"), col("event_type").as("type_b"))
    val p = a.join(b, Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("i"))
    p.join(broadcast(ts.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n", "n_a")), "type_a")
      .join(broadcast(ts.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n", "n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("i").as("n_shared"),
        col("n_a"), col("n_b"),
        expr("i * 10000 DIV (n_a + n_b - i)").as("jaccard_bp"))
  }

  val all: Seq[QueryDef] = Seq(eventTransitions, audienceOverlap)
}
