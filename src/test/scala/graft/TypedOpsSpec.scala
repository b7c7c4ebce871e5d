package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.TypedOps
import graft.operators.TypedOps.Scored

class TypedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAggregator == orderBy.limit on fixture distances") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val scored = emb
      .select(col("vec_id").as("id"),
        cosineDistance(col("embedding"), array(q.map(lit): _*)).as("dist"))
      .as[Scored]
    val viaAgg = scored.select(new TypedOps.TopKAggregator(5).toColumn).head()
    val viaSort = scored.orderBy(col("dist").asc, col("id").asc).limit(5).collect().toList
    assert(viaAgg == viaSort)
  }

  test("approx_count_distinct lands within 10% of exact (sketch surface)") {
    val li = Tables(spark, sf0001, "lineitem")
    val (approx, exact) = li
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.10, s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact row-selected median (sketch surface)") {
    val li = Tables(spark, sf0001, "lineitem")
    val approx = li.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    // exact lower/upper medians by deterministic row selection
    val n = li.count()
    val sorted = li.select(col("l_quantity")).orderBy("l_quantity")
    val lo = sorted.limit(((n + 1) / 2).toInt).orderBy(col("l_quantity").desc).head().getDouble(0)
    val hi = sorted.limit((n / 2 + 1).toInt).orderBy(col("l_quantity").desc).head().getDouble(0)
    assert(approx >= lo - 1e-9 && approx <= hi + 1e-9, s"approx=$approx lo=$lo hi=$hi")
  }
}
