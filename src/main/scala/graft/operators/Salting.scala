package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-stage salted aggregation. A hot group key that
  * would funnel into one reducer is split across `nSalts` sub-keys for
  * the partial aggregate, then merged. Because the engine's exact-sum
  * discipline (DECIMAL / integer sums) is associative, the salted result
  * is bit-identical to the direct aggregation — which is exactly what
  * the DuckDB oracle checks (plain GROUP BY).
  *
  * At 100 TB this (or AQE's runtime skew-join splitting) is how a
  * zipfian key distribution keeps the stage from being one straggler.
  */
object Salting {

  /** groupBy(keys).agg(sum(valueExpr), count) with an intermediate salt
    * stage. `valueExpr` must be an associative-exact type (decimal/long);
    * `saltSource` is any roughly-row-unique column (salt values do not
    * affect the result, only the distribution).
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueExpr: Column,
                     saltSource: Column, nSalts: Int): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(xxhash64(saltSource), lit(nSalts)))
      .withColumn("_v", valueExpr)
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col("_v")).as("_ps"), count(lit(1)).as("_pc"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_ps")).as("sum_value"), sum(col("_pc")).as("n"))
  }
}
