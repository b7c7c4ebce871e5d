package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing evidence: two tables bucketed+sorted on the join key join
  * WITHOUT any shuffle exchange — the co-location strategy for repeated
  * big-big joins at 100 TB (bucket once, join shuffle-free forever).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero ShuffleExchange") {
    // force the sort-merge path: tiny fixtures would broadcast, and AQE
    // wrapping hides the join node from plan inspection
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try bucketedJoinCheck()
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  private def bucketedJoinCheck(): Unit = {
    // stale warehouse dirs from earlier JVMs survive the in-memory catalog
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    val ord = Tables(spark, sf0001, "orders")
    val li = Tables(spark, sf0001, "lineitem")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    // the only shuffle allowed is the final groupBy aggregation exchange;
    // the join itself must be co-located (no exchange below the join)
    val joinNode = joined.queryExecution.executedPlan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joinNode.isDefined, "expected a sort-merge join over bucketed tables")
    val shufflesUnderJoin = joinNode.get.collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle; found ${shufflesUnderJoin.size} exchanges")
    // sanity: result matches the unbucketed join
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
  }
}
