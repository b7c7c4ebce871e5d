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
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
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

  val all: Seq[QueryDef] = Seq(q10Returned, q6Forecast)
}
