package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Relational analytics over the TPC-H-ish fixtures — the engine surface
  * the reference never had (SURVEY §2.2: filters, joins, aggregations,
  * windows, set ops) but a 100 TB pipeline needs as table stakes.
  *
  * Cross-engine float discipline: every SUM is computed over per-row
  * DECIMAL casts (order-independent exact arithmetic, so Spark's
  * partition-parallel partial aggregation and DuckDB's single-node sum
  * agree bit-for-bit), and any scalar math on aggregates happens after.
  *
  * Scale notes: aggregations are partial+final (map-side combine) by
  * construction; small dimension sides are broadcast explicitly; the
  * orderBy+limit pairs plan TakeOrderedAndProject, never a global sort.
  */
object RelationalQueries {

  private val Dec = "decimal(18,4)"

  /** TPC-H Q1-style pricing summary: scan-heavy groupBy with partial aggs.
    *
    * Output-type discipline (round-1 driver finding): sums are exact
    * DECIMAL internally (order-independent across partition-parallel
    * partial aggregation), but the OUTPUT columns are CAST to DOUBLE on
    * both sides — the driver's hash is representation-sensitive and
    * DECIMAL output encodings differ across engines even when values are
    * identical. Decimal→double conversion is deterministic (unscaled
    * values stay far below 2^53 at gate scale, so both engines produce
    * the same correctly-rounded double).
    */
  val q1Pricing: QueryDef = QueryDef.sql(
    "q1_pricing",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(Dec)).cast("double").as("sum_base"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec)).cast("double").as("sum_disc"),
        count(lit(1)).as("n"))
      .withColumn("avg_qty", col("sum_qty") / col("n"))
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base", "sum_disc", "avg_qty", "n")
  }

  /** TPC-H Q3-style: filtered 3-way join, revenue top-10. Customer side is
    * broadcast (segment-filtered dimension); lineitem never shuffles twice.
    */
  val q3TopOrders: QueryDef = QueryDef.sql(
    "q3_top_orders",
    """SELECT o_orderkey, CAST(revenue AS DOUBLE) AS revenue, odate FROM (
      |  SELECT o.o_orderkey,
      |         sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS revenue,
      |         CAST(epoch(o.o_orderdate) AS BIGINT) AS odate
      |  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |                 JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  WHERE c.c_mktsegment = 'BUILDING'
      |    AND o.o_orderdate < TIMESTAMP '1998-06-01'
      |    AND l.l_shipdate > TIMESTAMP '1998-06-01'
      |  GROUP BY o.o_orderkey, o.o_orderdate
      |  ORDER BY revenue DESC, o.o_orderkey
      |  LIMIT 10) t""".stripMargin) { (spark, dir) =>
    val cust = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer is SF-scaled (TPC-H: 150k rows PER SF) — no broadcast
    // hint; AQE broadcasts the filtered segment when it measures small
    // and shuffle-joins when it doesn't (a forced broadcast hard-fails
    // at 8 GB long before 100 TB)
    li.join(ord.join(cust, col("c_custkey") === col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec)).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        unix_timestamp(col("o_orderdate")).as("odate"))
      // top-10 selection orders on the EXACT decimal; only the surviving
      // rows cast to double (output-type discipline, header comment)
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("revenue").cast("double").as("revenue"), col("odate"))
  }

  /** TPC-H Q5-style: star join through supplier→nation→region (all
    * broadcast dims), revenue per nation.
    */
  val q5RegionRevenue: QueryDef = QueryDef.sql(
    "q5_region_revenue",
    """SELECT n.n_name,
      |       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem l
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |JOIN region r ON r.r_regionkey = n.n_regionkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n.n_name""".stripMargin) { (spark, dir) =>
    val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = Tables(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = Tables(spark, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    val reg = Tables(spark, dir, "region").filter(col("r_name") === "ASIA").select("r_regionkey")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey")
    // supplier is SF-scaled (10k rows per SF) — hint dropped, AQE
    // decides; nation (25) and region (5) are constant-size, hints stay
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(nat), col("n_nationkey") === col("s_nationkey"))
      .join(broadcast(reg), col("r_regionkey") === col("n_regionkey"))
      .groupBy("n_name")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Window function: top-3 orders per customer by price. */
  val qWindowRank: QueryDef = QueryDef.sql(
    "q_window_rank",
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      // BIGINT like DuckDB's row_number (Spark's is INT)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
  }

  /** Semi + anti join: customers with an open order and no finished order. */
  val qSemiAnti: QueryDef = QueryDef.sql(
    "q_semi_anti",
    """SELECT c_mktsegment, count(*) AS n
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |GROUP BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val open = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val fin = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
      .join(fin, cust("c_custkey") === fin("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
  }

  val all: Seq[QueryDef] =
    Seq(q1Pricing, q3TopOrders, q5RegionRevenue, qWindowRank, qSemiAnti)
}
