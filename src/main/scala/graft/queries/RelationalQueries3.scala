package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Third relational batch: two more canonical TPC-H shapes over the
  * available columns — Q10 (returned-item customer report: the
  * fact-heavy 4-way join with a group-topk head) and Q6 (the
  * single-table predicate-band revenue scan, the purest
  * pushdown/codegen probe in the suite). Same cross-engine
  * discipline as `RelationalQueries`: exact DECIMAL sums internally,
  * DOUBLE cast only at the output boundary.
  */
object RelationalQueries3 {

  private val Dec = "decimal(18,4)"

  /** TPC-H Q10 shape: revenue lost to returned items per customer over
    * one year, top 20. Plan: lineitem filters on returnflag at the
    * scan; orders filters on the date band at the scan; customer and
    * nation broadcast; one agg shuffle on custkey; the top-20 is
    * TakeOrderedAndProject (revenue DESC, custkey tiebreak).
    */
  val q10Returned: QueryDef = QueryDef.sql(
    "q10_returned",
    """SELECT c.c_custkey, c.c_name, n.n_name,
      |       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |WHERE l.l_returnflag = 'R'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, c.c_custkey
      |LIMIT 20""".stripMargin) { (spark, dir) =>
    val l = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    // customer is SF-scaled — no hint (AQE decides); nation is 25 rows
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q6 shape: one-table revenue-change scan — date band +
    * discount band + quantity cap, a single global aggregate. The
    * whole query should be scan + codegen'd filter + partial/final
    * agg with every predicate in PushedFilters; it exists as the
    * canary for pushdown regressions as much as for its number.
    */
  val q6Forecast: QueryDef = QueryDef.sql(
    "q6_forecast",
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast(Dec))
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q14 shape: promo revenue share — fact join to the part
    * dimension with a conditional aggregate. Part (2k rows at any
    * gate SF; bounded by catalog size, not corpus, at 100 TB)
    * broadcasts; the share is exact DECIMAL over DECIMAL cast to
    * DOUBLE only at the boundary.
    */
  val q14Promo: QueryDef = QueryDef.sql(
    "q14_promo",
    """SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
      |                     THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
      |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
      |       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin) { (spark, dir) =>
    val l = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec)
    // part is SF-scaled (200k rows per SF) — no hint, AQE decides
    l.join(Tables(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(Dec)))
        .cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Supplier-side revenue rollup (the supplier mirror of Q5's
    * customer-nation path): revenue per supplier nation and region.
    * Nation and region broadcast (constant-size); supplier is SF-scaled
    * so AQE picks its join side; one agg shuffle.
    */
  val qSupplierNation: QueryDef = QueryDef.sql(
    "q_supplier_nation",
    """SELECT n.n_name AS nation, r.r_name AS region,
      |       CAST(count(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers,
      |       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |JOIN region r ON r.r_regionkey = n.n_regionkey
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"), col("r_name").as("region"))
      .agg(countDistinct("s_suppkey").as("n_suppliers"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec))
          .cast("double").as("revenue"))
  }

  val all: Seq[QueryDef] = Seq(q10Returned, q6Forecast, q14Promo, qSupplierNation)
}
