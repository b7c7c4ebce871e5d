package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Window-frame coverage: running aggregates over explicit ROW frames
  * and an exact median via deterministic row selection (no reliance on
  * either engine's quantile interpolation convention — `percentile` /
  * `quantile_cont` interpolate with formulas that can differ in the last
  * ulp; row selection cannot).
  */
object WindowQueries {

  /** Per-customer running revenue, frame = unbounded preceding..current. */
  val runningSum: QueryDef = QueryDef.sql(
    "q_running_sum",
    """SELECT o_custkey, o_orderkey,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
      |            OVER (PARTITION BY o_custkey
      |                  ORDER BY o_orderdate, o_orderkey
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS DOUBLE) AS running
      |FROM orders""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        // exact decimal running sum; DOUBLE output (driver-hash discipline)
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
          .cast("double").as("running"))
  }

  /** Exact lower median per group: the value at row floor((n+1)/2) of the
    * deterministic (l_quantity, l_orderkey, l_linenumber) sort. Ranks
    * ride [[graft.operators.PrefixSum.rowNumber]] (round 13): a
    * row_number window partitioned by the 3-value return flag puts ~a
    * third of the fact table through ONE task — the #groups parallelism
    * ceiling the packer postmortem measured — where the segmented scan
    * keeps the identical (value, id...) total order at full
    * parallelism. Group counts join back from a flag-sized aggregate
    * (unhinted: AQE broadcasts an enum-sized frame on its real stats).
    */
  val median: QueryDef = QueryDef.sql(
    "q_median",
    """WITH r AS (
      |  SELECT l_returnflag, l_quantity,
      |         row_number() OVER (PARTITION BY l_returnflag
      |                            ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
      |         count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem)
      |SELECT l_returnflag,
      |       max(CASE WHEN rn = (n + 1) // 2 THEN l_quantity END) AS median_qty,
      |       max(CASE WHEN rn = (n * 95 + 99) // 100 THEN l_quantity END) AS p95_qty,
      |       max(n) AS n
      |FROM r GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
    val cnt = t.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    graft.operators.PrefixSum.rowNumber(t, "l_returnflag",
        Seq(col("l_quantity").asc, col("l_orderkey").asc, col("l_linenumber").asc), "rn")
      .join(cnt, "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        max(when(col("rn") === ((col("n") + 1) / lit(2)).cast("long"), col("l_quantity"))).as("median_qty"),
        max(when(col("rn") === ((col("n") * 95 + 99) / lit(100)).cast("long"), col("l_quantity"))).as("p95_qty"),
        max(col("n")).as("n"))
  }

  /** The remaining ranking/navigation window surface in one query:
    * ntile, percent_rank, cume_dist, lag, lead — per customer over the
    * deterministic (o_orderdate, o_orderkey) order. The tie-free
    * ordering makes every peer group a single row, so the rank-based
    * doubles are the same trivially-exact fractions in both engines;
    * lag/lead emit NULL at the edges (hash-identical).
    */
  val windowFuncs: QueryDef = QueryDef.sql(
    "q_window_funcs",
    """SELECT o_custkey, o_orderkey,
      |       CAST(ntile(4)      OVER w AS BIGINT) AS quartile,
      |       percent_rank()     OVER w AS pr,
      |       cume_dist()        OVER w AS cd,
      |       lag(o_totalprice)  OVER w AS prev_price,
      |       lead(o_totalprice) OVER w AS next_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
  }

  val all: Seq[QueryDef] = Seq(runningSum, median, windowFuncs)
}
