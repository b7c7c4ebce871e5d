package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The codegen expression must be bit-identical to the HOF formulation
  * (which in turn is bit-identical to the DuckDB oracle's sequential
  * fold) — on fixture data, not just toy vectors.
  */
class CosineDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("codegen == HOF bitwise on all fixture embedding pairs vs vec 0") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val qlit = array(q.map(lit): _*)
    val diff = emb.select(
      cosineDistance(col("embedding"), qlit).as("fast"),
      cosineDistanceHof(col("embedding"), qlit).as("hof"))
      .filter(col("fast") =!= col("hof"))
    assert(diff.count() == 0)
    val diffSim = emb.select(
      cosineSimilarity(col("embedding"), qlit).as("fast"),
      cosineSimilarityHof(col("embedding"), qlit).as("hof"))
      .filter(col("fast") =!= col("hof"))
    assert(diffSim.count() == 0)
  }

  test("codegen path actually participates in WholeStageCodegen") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val plan = emb.select(cosineDistance(col("embedding"), array(q.map(lit): _*)).as("d"))
      .queryExecution.executedPlan
    val hasWsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWsc, s"no WholeStageCodegenExec in:\n$plan")
  }

  test("interpreted eval agrees with Kahan oracle within 1e-12") {
    val rnd = new scala.util.Random(11)
    val a = Array.fill(64)(rnd.nextDouble() - 0.5)
    val b = Array.fill(64)(rnd.nextDouble() - 0.5)
    val d = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(cosineDistance(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(d - cosineDistanceKahan(a, b)) < 1e-12)
  }
}
