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
}
