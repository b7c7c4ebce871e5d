package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql, tokens}

/** Tenth curation batch — hand-rolled MERGEABLE SKETCHES plus two join
  * planning audits. The sketch pair (HyperLogLog, count-min) is the
  * fleet-state story made oracle-checkable: unlike the built-in
  * `approx_count_distinct` (whose HLL++ registers are engine-private),
  * these sketches are defined by the repo's own polyHash, so DuckDB
  * builds BIT-IDENTICAL registers and the accuracy claims (est vs
  * exact, error in bp) are verified numbers, not tolerances. Register
  * arrays are tiny, mergeable by max/sum, and every build is one
  * bounded aggregate — the shape that lets 1000 executors each sketch
  * their shard and a final reduce merge 64 longs.
  */
object CurationQueries10 {

  /** Deterministic HYPERLOGLOG (m=256 registers) per event_type over
    * distinct active user-days, with the published small-range (linear
    * counting) correction — estimate vs exact, error in basis points
    * (measured 0.6-12.7% across types at sf0.01; σ = 1.04/√256 ≈ 6.5%
    * is the published bound). Hash design carries two scars from this
    * repo's own probes: (a) bucket and rho come from SEPARATE salted
    * hashes because one hash's low bits + high bits are coupled, and
    * (b) each is SQUARE-MIXED ((x² mod p); the rendezvous-shard
    * lesson) because two salted polyhashes of the same key differ
    * affinely per length class — squaring adds the x-dependent cross
    * term that decorrelates them. rho counts the leading-zero position
    * inside a 2^22 window (uniform: 2^22 divides into p's range ~239x,
    * so the mod bias is negligible), registers are max(rho).
    * Estimate = α₂₅₆·m²/Σ2^(−M) with α = 0.7213/(1+1.079/256), linear
    * counting m·ln(m/V) below 2.5m with V empty registers — both
    * branches exact-deterministic on integer registers. SCALE: the
    * register build is a (type × 256)-bounded max-aggregate with
    * map-side combine; registers MERGE by max — the distributed-sketch
    * contract: 1000 executors sketch shards, a reduce merges 256
    * bytes; the estimate algebra runs on 5×256 rows.
    */
  val hllSketch: QueryDef = QueryDef.sql(
    "q_hll_sketch",
    s"""WITH k AS (SELECT event_type,
       |                 CAST(user_id AS VARCHAR) || '@' || strftime(ts, '%Y-%m-%d') AS key
       |          FROM events),
       |h AS (SELECT event_type, key,
       |             ${polyHashSql("'i#' || key")} AS xi,
       |             ${polyHashSql("'r#' || key")} AS xr FROM k),
       |r AS (SELECT event_type,
       |             (xi * xi) % 1000000007 % 256 AS idx,
       |             CASE WHEN (xr * xr) % 1000000007 % 4194304 = 0 THEN 23
       |                  ELSE 23 - length(bin((xr * xr) % 1000000007 % 4194304)) END AS rho
       |      FROM h),
       |reg AS (SELECT event_type, idx, max(rho) AS m FROM r GROUP BY 1, 2),
       |grid AS (SELECT DISTINCT event_type FROM events),
       |full_reg AS (SELECT g.event_type, u.idx, coalesce(reg.m, 0) AS m
       |             FROM grid g CROSS JOIN (SELECT unnest(range(0, 256)) AS idx) u
       |             LEFT JOIN reg ON reg.event_type = g.event_type AND reg.idx = u.idx),
       |est0 AS (SELECT event_type,
       |                sum(1.0 / CAST((1::BIGINT << m) AS DOUBLE)) AS s,
       |                count(*) FILTER (WHERE m = 0) AS v
       |         FROM full_reg GROUP BY 1),
       |est AS (SELECT event_type,
       |               CASE WHEN 0.7213 / (1 + 1.079 / 256) * 65536 / s <= 640 AND v > 0
       |                    THEN CAST(floor(256 * ln(256.0 / v)) AS BIGINT)
       |                    ELSE CAST(floor(0.7213 / (1 + 1.079 / 256) * 65536 / s) AS BIGINT)
       |               END AS est
       |        FROM est0),
       |ex AS (SELECT event_type, CAST(count(DISTINCT key) AS BIGINT) AS exact
       |       FROM k GROUP BY 1)
       |SELECT est.event_type, est.est, ex.exact,
       |       CAST((abs(est.est - ex.exact) * 10000) // ex.exact AS BIGINT) AS err_bp
       |FROM est JOIN ex USING (event_type)""".stripMargin) { (spark, dir) =>
    val k = Tables.events(spark, dir)
      .select(col("event_type"),
        concat(col("user_id").cast("string"), lit("@"),
          date_format(col("ts"), "yyyy-MM-dd")).as("key"))
    def sqMix(salt: String) =
      pmod(polyHash(concat(lit(salt), col("key"))) * polyHash(concat(lit(salt), col("key"))),
        lit(1000000007L))
    val r = k.select(col("event_type"),
      pmod(sqMix("i#"), lit(256L)).as("idx"),
      when(pmod(sqMix("r#"), lit(4194304L)) === 0, lit(23))
        .otherwise(lit(23) - length(bin(pmod(sqMix("r#"), lit(4194304L))))).as("rho"))
    val reg = r.groupBy("event_type", "idx").agg(max("rho").as("m"))
    val grid = k.select("event_type").distinct()
      .crossJoin(spark.range(256).select(col("id").as("idx")))
    val fullReg = grid.join(reg, Seq("event_type", "idx"), "left")
      .select(col("event_type"), coalesce(col("m"), lit(0)).as("m"))
    val alphaM2 = lit(0.7213) / (lit(1) + lit(1.079) / 256) * 65536
    val est = fullReg.groupBy("event_type")
      .agg(sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)")).as("s"),
        count(when(col("m") === 0, 1)).as("v"))
      .select(col("event_type"),
        when(alphaM2 / col("s") <= 640 && col("v") > 0,
          floor(lit(256) * log(lit(256.0) / col("v"))).cast("long"))
          .otherwise(floor(alphaM2 / col("s")).cast("long")).as("est"))
    val ex = k.groupBy("event_type").agg(countDistinct("key").as("exact"))
    est.join(ex, "event_type")
      .select(col("event_type"), col("est"), col("exact"),
        expr("abs(est - exact) * 10000 DIV exact").as("err_bp"))
  }

  /** Deterministic COUNT-MIN sketch (d=4 rows × w=512) over document
    * tokens: the sketch counts, then point estimates for the top-10
    * exact tokens with the overcount in basis points (CM guarantees
    * est ≥ exact; the report shows how tight at this width). Salted
    * polyHash rows — both engines build the identical 2048-cell
    * sketch. SCALE: the build is a 2048-bounded count with map-side
    * combine (mergeable by cell-wise SUM across shards); estimation
    * touches 10×4 cells.
    */
  val cmsSketch: QueryDef = QueryDef.sql(
    "q_cms_sketch",
    s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |cells AS (SELECT r, ${polyHashSql("tok || '|' || CAST(r AS VARCHAR)")} % 512 AS b,
       |                 count(*) AS cnt
       |          FROM tk CROSS JOIN (SELECT unnest(range(0, 4)) AS r) s
       |          GROUP BY 1, 2),
       |ex AS (SELECT tok, count(*) AS exact FROM tk GROUP BY 1
       |       ORDER BY exact DESC, tok LIMIT 10),
       |lu AS (SELECT ex.tok, ex.exact, c.cnt
       |       FROM ex CROSS JOIN (SELECT unnest(range(0, 4)) AS r) s
       |       JOIN cells c ON c.r = s.r
       |         AND c.b = ${polyHashSql("ex.tok || '|' || CAST(s.r AS VARCHAR)")} % 512)
       |SELECT tok, CAST(exact AS BIGINT) AS exact,
       |       CAST(min(cnt) AS BIGINT) AS est,
       |       CAST(((min(cnt) - exact) * 10000) // exact AS BIGINT) AS over_bp
       |FROM lu GROUP BY tok, exact""".stripMargin) { (spark, dir) =>
    val tk = Tables(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
    val salts = (0 until 4).map(r => struct(lit(r).as("r"),
      pmod(polyHash(concat(col("tok"), lit("|"), lit(r).cast("string"))), lit(512L)).as("b")))
    val cells = tk.select(explode(array(salts: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val ex = tk.groupBy("tok").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("tok")).limit(10)
    val lu = ex.select(col("tok"), col("exact"), explode(array(salts: _*)).as("rb"))
      .select(col("tok"), col("exact"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(cells), Seq("r", "b"))
    lu.groupBy("tok", "exact")
      .agg(min("cnt").as("est"))
      .select(col("tok"), col("exact"), col("est"),
        expr("(est - exact) * 10000 DIV exact").as("over_bp"))
  }

  /** JOIN-KEY SKEW AUDIT on the lineitem⋈orders key — the histogram a
    * planner (or an engineer choosing a salting factor) reads before a
    * 100 TB shuffle join: top-10 heaviest keys with corpus share, plus
    * the max·n_keys/total skew ratio (1.00x = perfectly uniform; the
    * AQE skew-join threshold decision in one number). SCALE: one
    * key-count aggregate with map-side combine + a top-10 heap
    * (TakeOrderedAndProject); the rank window runs on 10 rows.
    */
  val skewAudit: QueryDef = QueryDef.sql(
    "q_skew_audit",
    """WITH kc AS (SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_keys,
      |               CAST(max(cnt) AS BIGINT) AS max_cnt FROM kc),
      |top AS (SELECT k, cnt FROM kc ORDER BY cnt DESC, k LIMIT 10)
      |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, k) AS BIGINT) AS rank,
      |       k AS l_orderkey, CAST(cnt AS BIGINT) AS cnt,
      |       CAST((cnt * 10000) // total AS BIGINT) AS share_bp,
      |       CAST((max_cnt * n_keys * 100) // total AS BIGINT) AS skew_x100
      |FROM top, tot""".stripMargin) { (spark, dir) =>
    val kc = Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cnt"))
    val tot = kc.agg(sum("cnt").cast("long").as("total"),
      count(lit(1)).as("n_keys"), max("cnt").as("max_cnt"))
    val top = kc.orderBy(col("cnt").desc, col("k")).limit(10)
    top.crossJoin(broadcast(tot))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("k"))).cast("long"))
      .select(col("rank"), col("k").as("l_orderkey"), col("cnt"),
        expr("cnt * 10000 DIV total").as("share_bp"),
        expr("max_cnt * n_keys * 100 DIV total").as("skew_x100"))
  }

  /** BLOOM-STYLE PREJOIN AUDIT — the runtime-filter decision priced on
    * real data: build the distinct hash-bucket set (m=65536) of the
    * FILTERED orders side, prefilter lineitem by bucket membership,
    * and compare against the exact semi-join: pass count, true count,
    * false-positive rate among true negatives, and bucket fill. This
    * is the measurement behind "push a bloom filter into the probe
    * side scan" — at fill f the expected FP rate among non-matches is
    * ≈ f, and the report states the realized value. SCALE: the bucket
    * set is a bounded (≤65536-row) broadcast semi-join against the
    * probe scan. The EXACT-truth side joins on the raw selected-order
    * keys — Θ(selected orders), SF-scaled — so it carries no broadcast
    * hint (round 12): AQE broadcasts it when it measures small and
    * falls back to a shuffled semi-join when it doesn't.
    */
  val bloomPrejoin: QueryDef = QueryDef.sql(
    "q_bloom_prejoin",
    s"""WITH sel AS (SELECT o_orderkey FROM orders
       |             WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'),
       |bk AS (SELECT DISTINCT ${polyHashSql("CAST(o_orderkey AS VARCHAR)")} % 65536 AS b
       |       FROM sel),
       |li AS (SELECT l_orderkey,
       |              ${polyHashSql("CAST(l_orderkey AS VARCHAR)")} % 65536 AS b
       |       FROM lineitem),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_lineitem FROM li),
       |np AS (SELECT CAST(count(*) AS BIGINT) AS n_pass FROM li
       |       WHERE b IN (SELECT b FROM bk)),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM li
       |       WHERE l_orderkey IN (SELECT o_orderkey FROM sel)),
       |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets FROM bk)
       |SELECT n_lineitem, n_pass, n_true, n_buckets,
       |       CAST((n_buckets * 10000) // 65536 AS BIGINT) AS fill_bp,
       |       CAST(((n_pass - n_true) * 10000)
       |            // greatest(n_lineitem - n_true, 1) AS BIGINT) AS fp_bp
       |FROM n, np, nt, nb""".stripMargin) { (spark, dir) =>
    val sel = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= "2000-01-01 00:00:00")
      .select(col("o_orderkey"))
    val bk = sel.select(pmod(polyHash(col("o_orderkey").cast("string")), lit(65536L)).as("b"))
      .distinct()
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        pmod(polyHash(col("l_orderkey").cast("string")), lit(65536L)).as("b"))
    val n = li.agg(count(lit(1)).as("n_lineitem"))
    val np = li.join(broadcast(bk), Seq("b"), "left_semi").agg(count(lit(1)).as("n_pass"))
    val nt = li.join(sel.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi").agg(count(lit(1)).as("n_true"))
    val nb = bk.agg(count(lit(1)).as("n_buckets"))
    n.crossJoin(np).crossJoin(nt).crossJoin(nb)
      .select(col("n_lineitem"), col("n_pass"), col("n_true"), col("n_buckets"),
        expr("n_buckets * 10000 DIV 65536").as("fill_bp"),
        expr("(n_pass - n_true) * 10000 DIV greatest(n_lineitem - n_true, 1)").as("fp_bp"))
  }

  val all: Seq[QueryDef] = Seq(hllSketch, cmsSketch, skewAudit, bloomPrejoin)
}
