package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def distOf(a: Seq[Double], b: Seq[Double]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(cosineDistance(col("a"), col("b")).as("d"))
      .head().getDouble(0)

  test("cosine distance: hand-computed values") {
    assert(math.abs(distOf(Seq(1, 0), Seq(0, 1)) - 1.0) < 1e-12)
    assert(math.abs(distOf(Seq(1, 0), Seq(-1, 0)) - 2.0) < 1e-12)
    assert(math.abs(distOf(Seq(1, 2, 3), Seq(1, 2, 3))) < 1e-12)
    assert(math.abs(distOf(Seq(1, 1), Seq(1, 0)) - (1 - 1 / math.sqrt(2))) < 1e-12)
  }

  test("agrees with Kahan oracle within 1e-12 on random vectors") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val a = Array.fill(64)(rnd.nextDouble() - 0.5)
      val b = Array.fill(64)(rnd.nextDouble() - 0.5)
      assert(math.abs(distOf(a.toSeq, b.toSeq) - cosineDistanceKahan(a, b)) < 1e-12)
    }
  }

  test("scale invariance and symmetry") {
    val a = Seq(0.3, -1.2, 0.7); val b = Seq(2.0, 0.1, -0.5)
    assert(math.abs(distOf(a, b) - distOf(b, a)) < 1e-12)
    assert(math.abs(distOf(a.map(_ * 7), b) - distOf(a, b)) < 1e-12)
  }

  test("TopK.nearest: n < k returns n rows; exact ties break on id") {
    import graft.operators.TopK
    val db = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)))
      .toDF("id", "embedding")
    // k > n: 3 rows back, no hard exit (documented deviation from
    // vector-db.c:160-163)
    val got = TopK.nearest(db, "embedding", "id", Seq(1.0, 0.0), 10)
    assert(got.count() == 3)
    // ids 1 and 2 tie at dist 0 -> deterministic id order
    assert(got.select("id").as[Long].collect().toSeq.take(2) == Seq(1L, 2L))
  }

  test("packSignBits packs bit i iff v[i] > 0, hamming counts differing bits") {
    val df = Seq((Seq(1.0, -1.0, 0.5, 0.0), Seq(1.0, 1.0, -0.5, 2.0))).toDF("a", "b")
    val row = df.select(
      packSignBits(col("a"), 4).as("pa"),
      packSignBits(col("b"), 4).as("pb")).head()
    assert(row.getLong(0) == 5L) // bits 0,2
    assert(row.getLong(1) == 11L) // bits 0,1,3
    val h = df.select(hammingBits(packSignBits(col("a"), 4), packSignBits(col("b"), 4))).head().getLong(0)
    assert(h == 3L)
  }

  test("QuantizedL2Expr: exact integer-scaled squared L2") {
    import graft.functions.QuantizedL2Expr
    val df = Seq((Seq(1.5, -2.0), Seq(0.5, 1.0))).toDF("a", "b")
    val d2 = df.select(QuantizedL2Expr.column(col("a"), col("b"), 45)).head().getLong(0)
    // (1.0)^2 + (-3.0)^2 = 10, exactly representable -> 10 * 2^45
    assert(d2 == 10L * (1L << 45))
  }

  test("VectorKernels.randomProj matches a naive reference on varied dims") {
    // independent reimplementation, straight from the definition
    def reference(v: Array[Double], outDims: Int): Array[Double] =
      Array.tabulate(outDims) { j =>
        v.indices.map { i =>
          val q = math.floor(v(i) * 4503599627370496.0).toLong
          if (((i * 1000003 + j * 7919) % 97) % 2 == 0) q else -q
        }.sum.toDouble / 4503599627370496.0
      }
    val rnd = new scala.util.Random(23)
    for (n <- Seq(0, 1, 3, 16, 64, 100); _ <- 1 to 20) {
      val v = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val got = graft.functions.VectorKernels.randomProj(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v), 16)
      val want = reference(v, 16)
      assert(got.length == 16)
      assert(got.indices.forall(j =>
        java.lang.Double.doubleToLongBits(got(j)) ==
          java.lang.Double.doubleToLongBits(want(j))), s"n=$n")
    }
  }

  test("RandomProjExpr is bit-identical to the nested-HOF formulation on fixture data") {
    import graft.functions.RandomProjExpr
    val v = col("embedding")
    def qterm(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(element_at(v, (i + 1).cast("int")) * lit(4503599627370496.0)).cast("long")
    val hofProj = transform(sequence(lit(0), lit(15)), j =>
      aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, i) =>
        acc + when(((i * 1000003 + j * 7919) % 97) % 2 === 0, qterm(i))
          .otherwise(-qterm(i))))
    val diff = Tables.embeddings(spark, sf0001)
      .select(RandomProjExpr.column(v, 16).as("fast"),
        transform(hofProj, p => p.cast("double") / lit(4503599627370496.0)).as("hof"))
      .filter(col("fast") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("packSignBits codegen expression is bit-identical to the HOF fold") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Seq.fill(64)(rnd.nextDouble() - 0.5))
    val df = vecs.map(Tuple1(_)).toDF("v")
    for (bits <- Seq(4, 32, 62)) {
      val rows = df.select(
        packSignBits(col("v"), bits).as("fast"),
        packSignBitsHof(col("v"), bits).as("hof")).collect()
      assert(rows.forall(r => r.getLong(0) == r.getLong(1)), s"bits=$bits")
    }
    // short arrays: only the available elements fold (HOF slice semantics)
    val short = Seq(Tuple1(Seq(1.0, -1.0, 1.0))).toDF("v")
    val r = short.select(packSignBits(col("v"), 8).as("fast"),
      packSignBitsHof(col("v"), 8).as("hof")).head()
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) == 5L)
  }
}
