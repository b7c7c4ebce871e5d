package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the latest right row with the
  * same key and `right.ts <= left.ts` (inclusive).
  *
  * Built by composition (preference order (a) — no custom plan node
  * needed): union both sides, one window pass per key ordered by
  * (ts, side, tieCols) with right rows sorting before left rows at equal
  * timestamps, and `last(_, ignoreNulls)` carrying the most recent right
  * payload forward.
  *
  * Scale shape: ONE shuffle on the key (the window partition), then a
  * linear in-partition scan — the same cost profile as a sort-merge
  * as-of join, with no range explosion. Skewed keys: pre-split with
  * [[Salting]]-style sub-keys per time range if one key dominates.
  */
object AsOfJoin {

  /** left(keyCol, ltsCol, ...) ⟕asof right(keyCol, rtsCol, payload...):
    * all left columns plus right payload columns as `asof_<name>`
    * (null when no right row precedes). `rightTieCols` break ordering
    * ties among right rows sharing (key, ts) — last one wins.
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               ltsCol: String, rtsCol: String,
               rightTieCols: Seq[String] = Nil): DataFrame = {
    val lStruct = struct(left.columns.map(c => left(c).as(c)): _*)
    val rStruct = struct(right.columns.map(c => right(c).as(c)): _*)
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)

    val lRows = left.select(
      left(keyCol).as("_k"), left(ltsCol).as("_ts"), lit(1).as("_side"),
      lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rRows = right.select(
      right(keyCol).as("_k"), right(rtsCol).as("_ts"), lit(0).as("_side"),
      lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    val order: Seq[Column] =
      Seq(col("_ts").asc, col("_side").asc) ++ rightTieCols.map(c => col(s"_r.$c").asc_nulls_first)
    val w = Window.partitionBy(col("_k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lRows.unionByName(rRows)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col("_l.*")) ++ right.columns.map(c => col(s"_m.$c").as(s"asof_$c")): _*)
  }
}
