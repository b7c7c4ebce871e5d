package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Subquery shapes: Catalyst decorrelates these into joins — included so
  * the category matrix's subquery row is exercised against the oracle.
  */
object SubqueryQueries {

  /** Orders priced above 2x their customer's average order price
    * (correlated scalar subquery; exact decimal average).
    */
  val aboveCustomerAvg: QueryDef = QueryDef.sql(
    "q_above_cust_avg",
    """SELECT o_orderkey
      |FROM orders o
      |WHERE o_totalprice > (
      |  SELECT 2 * CAST(CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) / count(*)
      |  FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin) { (spark, dir) =>
    // window formulation: one scan + one shuffle on o_custkey, no join,
    // no broadcast of an aggregate table (the groupBy+join shape showed a
    // super-linear step in the 10x scale probe from broadcast growth);
    // identical exact-decimal semantics to the oracle's correlated subquery
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
    Tables(spark, dir, "orders")
      .withColumn("threshold",
        lit(2) * sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
          .cast("decimal(38,4)").cast("double") / count(lit(1)).over(w))
      .filter(col("o_totalprice") > col("threshold"))
      .select("o_orderkey")
  }

  val all: Seq[QueryDef] = Seq(aboveCustomerAvg)
}
