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

  /** EVENT INTERVAL JOIN — click→purchase pairs for the same user
    * within ±1 hour: the batch twin of the streaming dual-watermark
    * interval join ([[graft.streaming.EventStreams.intervalJoins]]),
    * and the attribution primitive every event pipeline ships.
    *
    * SCALE: NOT a per-user non-equi join (per-user candidate mass is
    * clicks×purchases — a hot user goes quadratic, and the range
    * predicate alone plans a nested loop). Instead the `q_snm_blocking`
    * band shape: purchases key by their hour bucket, clicks explode to
    * the ≤3 buckets their ±1 h window can touch, the join is a pure
    * (user, hour-bucket) EQUI-join — hash-partitioned, AQE-splittable —
    * and the true |pts−cts| ≤ 1 h predicate runs as a residual filter.
    * Each true pair matches in EXACTLY one bucket (the purchase's), so
    * no dedup pass is needed. Gap is emitted in raw µs (no integer
    * division — Spark DIV truncates toward zero while DuckDB floors,
    * which diverges on negative gaps). The oracle states the same join
    * as the plain range predicate.
    */
  val intervalJoin: QueryDef = QueryDef.sql(
    "q_interval_join",
    """WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus
      |      FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, c.click_id, p.purchase_id,
      |       CAST(p.pus - c.cus AS BIGINT) AS gap_us
      |FROM c JOIN p ON p.user_id = c.user_id
      |  AND p.pus BETWEEN c.cus - 3600000000 AND c.cus + 3600000000""".stripMargin) {
    (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("cus"))
      .withColumn("hb", explode(sequence(
        expr("cus div 3600000000 - 1"), expr("cus div 3600000000 + 1"))))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pus"))
      .withColumn("hb", expr("pus div 3600000000"))
    c.join(p, c("user_id") === p("p_user") && c("hb") === p("hb"))
      .filter(col("pus") >= col("cus") - 3600000000L &&
        col("pus") <= col("cus") + 3600000000L)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("pus") - col("cus")).as("gap_us"))
  }

  /** INTERVAL ANTI-JOIN — clicks with NO purchase from the same user
    * within ±1 hour: the attribution-gap report (what share of ad
    * clicks never converted inside the window), and the batch twin of
    * the null-padded rows the streaming LEFT OUTER interval join
    * ([[graft.streaming.EventStreams.intervalJoinsLeftOuter]]) emits
    * at state-eviction time.
    *
    * SCALE: the same (user, hour-bucket) EQUI-join blocking as
    * `q_interval_join` — never a nested-loop range anti-join. A click
    * is unmatched iff NONE of its ≤3 buckets matched, so the anti side
    * is a distinct matched-click set (bare BIGINT ids across the
    * shuffle) followed by a left_anti equi-join — both
    * hash-partitioned, both AQE-splittable. The oracle states the
    * same thing as a plain NOT EXISTS range predicate.
    */
  val intervalUnmatched: QueryDef = QueryDef.sql(
    "q_interval_unmatched",
    """WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, epoch_us(ts) AS pus
      |      FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, c.click_id, CAST(c.cus AS BIGINT) AS cus
      |FROM c WHERE NOT EXISTS (
      |  SELECT 1 FROM p WHERE p.user_id = c.user_id
      |    AND p.pus BETWEEN c.cus - 3600000000 AND c.cus + 3600000000)""".stripMargin) {
    (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("cus"))
    val cb = c.withColumn("hb", explode(sequence(
      expr("cus div 3600000000 - 1"), expr("cus div 3600000000 + 1"))))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("pus"))
      .withColumn("hb", expr("pus div 3600000000"))
    val matched = cb.join(p, cb("user_id") === p("p_user") && cb("hb") === p("hb"))
      .filter(col("pus") >= col("cus") - 3600000000L &&
        col("pus") <= col("cus") + 3600000000L)
      .select("click_id").distinct()
    c.join(matched, Seq("click_id"), "left_anti")
      .select(col("user_id"), col("click_id"), col("cus"))
  }

  val all: Seq[QueryDef] = Seq(eventTransitions, audienceOverlap, intervalJoin,
    intervalUnmatched)
}
