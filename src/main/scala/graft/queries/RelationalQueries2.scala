package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.Salting

/** Second wave of relational coverage: multi-dimensional aggregation
  * (CUBE), time-bucketed trends, exact distinct counts, full set ops,
  * and the skew-salting pattern (whose output is proven bit-identical to
  * the direct aggregation by the plain-GROUP-BY oracle).
  */
object RelationalQueries2 {

  // Sums stay exact DECIMAL internally; OUTPUT columns cast to DOUBLE on
  // both sides (the driver's hash is representation-sensitive to DECIMAL
  // encodings — see RelationalQueries' header note).
  private val Dec = "decimal(18,4)"

  /** CUBE over returnflag × linestatus; rollup rows identified by the
    * NULL→'ALL' coalesce (source columns are non-null), which avoids any
    * cross-engine grouping-id bit-order convention.
    */
  val cube: QueryDef = QueryDef.sql(
    "q_cube",
    """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
      |       coalesce(l_linestatus, 'ALL') AS lstatus,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("n"), col("sum_qty"))
  }

  /** ROLLUP counterpart of [[cube]] — hierarchical subtotals only
    * (flag, flag×status, grand total), same NULL→'ALL' discipline.
    */
  val rollup: QueryDef = QueryDef.sql(
    "q_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
      |       coalesce(l_linestatus, 'ALL') AS lstatus,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("n"), col("sum_qty"))
  }

  /** Explicit GROUPING SETS (the generalization CUBE/ROLLUP compile to)
    * with `grouping_id()`: detail, per-flag subtotal, and grand total in
    * one pass. The gid is emitted as explicit `grouping()` bit arithmetic
    * in the oracle so no cross-engine bit-order convention is assumed —
    * Spark's no-arg `grouping_id()` uses the same first-column-is-MSB
    * order over the grouping columns.
    */
  val groupingSets: QueryDef = QueryDef.sql(
    "q_grouping_sets",
    """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
      |       coalesce(l_linestatus, 'ALL') AS lstatus,
      |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("gid"), col("n"), col("sum_qty"))
  }

  /** Approximate distinct counts with the error bound ENCODED IN THE
    * QUERY: the output carries `ok` booleans asserting the HLL++ sketch
    * landed within its documented relative standard deviation (rsd 0.05,
    * checked at 3σ) of the exact count — the oracle asserts the same
    * booleans as literal TRUE, so a sketch drifting out of tolerance
    * fails the hash gate. At 100 TB the approx form is the default (no
    * per-group distinct shuffle, mergeable sketches); the exact twin for
    * reference is [[distinctCounts]] on the same columns.
    */
  val approxDistinct: QueryDef = QueryDef.sql(
    "q_approx_distinct",
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts_exact,
      |       count(DISTINCT l_suppkey) AS n_supps_exact,
      |       TRUE AS parts_ok,
      |       TRUE AS supps_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    val rsd = 0.05
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts_exact"),
        countDistinct(col("l_suppkey")).as("n_supps_exact"),
        approx_count_distinct(col("l_partkey"), rsd).as("ap"),
        approx_count_distinct(col("l_suppkey"), rsd).as("as_"))
      .select(col("l_returnflag"), col("n_parts_exact"), col("n_supps_exact"),
        (abs(col("ap") - col("n_parts_exact")).cast("double")
          <= col("n_parts_exact") * (3 * rsd)).as("parts_ok"),
        (abs(col("as_") - col("n_supps_exact")).cast("double")
          <= col("n_supps_exact") * (3 * rsd)).as("supps_ok"))
  }

  /** Approximate percentile with the rank-error bound ENCODED IN THE
    * QUERY, like [[approxDistinct]]: `percentile_approx` (accuracy
    * 10000 → rank error ≤ N/10000, an element of the data) must land
    * between the exact p±5% RANK-selected elements computed by the SAME
    * engine — each engine checks its own bounds, the oracle asserts
    * literal TRUE, and a sketch outside the envelope fails the hash
    * gate. The exact envelope rides
    * [[graft.operators.PrefixSum.rowNumber]] (round-13 aggkeys sweep):
    * the previous exact `percentile(...)` aggregate buffered every
    * (value, count) of its group in ONE reducer's heap, grouped by the
    * 3-value return flag — Θ(corpus/3) state per task, the aggregate
    * form of the hot-group class the q_median window rewrite retired.
    * Element selection at ranks ⌊.45n⌋/⌈.55n⌉/⌊.85n⌋/⌈.95n⌉ bounds the
    * sketch the same way (the sketch's true rank is within n/10000 of
    * target, and sorted order maps rank containment to value
    * containment) with zero per-group state. The exact element-based
    * median twin is `q_median` (same segmented-scan rank path).
    */
  val approxQuantile: QueryDef = QueryDef.sql(
    "q_approx_quantile",
    """SELECT l_returnflag, count(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
    val cnt = t.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    def atRank(r: org.apache.spark.sql.Column, out: String) =
      max(when(col("rn") === r, col("l_extendedprice"))).as(out)
    // envelope AND sketch fold out of ONE pass over the rank frame
    // (which the scan path has already checkpointed): a separate
    // sketch branch would re-scan the fact table a second time
    graft.operators.PrefixSum.rowNumber(t, "l_returnflag",
        Seq(col("l_extendedprice").asc, col("l_orderkey").asc, col("l_linenumber").asc), "rn")
      .join(cnt, "l_returnflag")
      .groupBy("l_returnflag")
      .agg(max(col("n")).as("n"),
        atRank(greatest((col("n") * 45 / lit(100)).cast("long"), lit(1L)), "p45"),
        atRank(((col("n") * 55 + 99) / lit(100)).cast("long"), "p55"),
        atRank(greatest((col("n") * 85 / lit(100)).cast("long"), lit(1L)), "p85"),
        atRank(((col("n") * 95 + 99) / lit(100)).cast("long"), "p95"),
        // ONE sketch per group (the array-percentage form: separate
        // percentile_approx exprs would build four summaries)
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)).as("a"))
      .select(col("l_returnflag"), col("n"),
        (col("a")(0) >= col("p45") && col("a")(0) <= col("p55")).as("p50_ok"),
        (col("a")(1) >= col("p85") && col("a")(1) <= col("p95")).as("p90_ok"))
  }

  /** Monthly revenue trend: date_trunc bucketing over two years. */
  val monthlyTrend: QueryDef = QueryDef.sql(
    "q_monthly_trend",
    """SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_ts,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(Dec)).cast("double").as("revenue"))
      .select(unix_timestamp(col("m")).as("month_ts"), col("n_orders"), col("revenue"))
  }

  /** Exact distinct cardinalities (the exact counterpart of the
    * approx_count_distinct sketch surface, which has no cross-engine
    * oracle; the sketch variant is exercised in tests with tolerance).
    */
  val distinctCounts: QueryDef = QueryDef.sql(
    "q_distinct_counts",
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n"))
  }

  /** UNION / INTERSECT / EXCEPT composed: customers in two segments,
    * intersected with open-order holders, minus finished-order holders.
    */
  val setOps: QueryDef = QueryDef.sql(
    "q_setops",
    """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | UNION
      | SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (spark, dir) =>
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val seg = cust.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .union(cust.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey")))
      .distinct()
    seg.intersect(ord.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("c_custkey")))
      .except(ord.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey")))
  }

  /** Two-stage salted aggregation — bit-identical to the oracle's plain
    * GROUP BY because the sums are exact decimals (associativity holds).
    */
  val saltedAgg: QueryDef = QueryDef.sql(
    "q_salted_agg",
    """SELECT l_returnflag,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |       count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    Salting.saltedSumCount(
      Tables(spark, dir, "lineitem"),
      Seq("l_returnflag"),
      col("l_extendedprice").cast(Dec),
      col("l_orderkey"), nSalts = 16)
      .select(col("l_returnflag"), col("sum_value").cast("double").as("sum_value"), col("n"))
  }

  /** TPC-H Q18 shape: large-quantity orders via HAVING over a 3-way
    * join. The group-then-filter runs BEFORE the customer join in the
    * Spark form — the aggregation shrinks lineitem to order grain and
    * HAVING keeps a handful of rows, so only survivors join customer
    * (broadcast): the join order a 100 TB plan needs, stated
    * declaratively. Quantities sum as BIGINT (integer-valued column) —
    * no decimal in the output schema.
    */
  val bigOrders: QueryDef = QueryDef.sql(
    "q_big_orders",
    """WITH big AS (
      |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
      |SELECT c.c_name, o.o_orderkey, big.total_qty
      |FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey
      |         JOIN customer c ON c.c_custkey = o.o_custkey""".stripMargin) { (spark, dir) =>
    val big = Tables(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 300)
    big.join(Tables(spark, dir, "orders"),
        big("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("total_qty"))
  }

  val all: Seq[QueryDef] = Seq(cube, rollup, groupingSets, approxDistinct,
    approxQuantile, monthlyTrend, distinctCounts, setOps, saltedAgg, bigOrders)
}
