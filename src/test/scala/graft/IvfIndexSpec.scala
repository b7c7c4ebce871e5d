package graft

import org.apache.spark.sql.functions._
import graft.operators.IvfIndex

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*) = xs.toSeq

  private lazy val emb = Seq(
    (0L, vec(1.0, 0.0)), (1L, vec(0.0, 1.0)),           // seeds -> clusters 0, 1
    (2L, vec(0.9, 0.1)), (3L, vec(0.8, 0.0)),           // near cluster 0
    (4L, vec(0.1, 0.9)), (5L, vec(0.0, 0.8))            // near cluster 1
  ).toDF("vec_id", "embedding")

  private lazy val seeds = emb.filter(col("vec_id") < 2)
    .select(col("vec_id").as("cluster"), col("embedding").as("cv"))

  test("assign routes every vector to its nearest seed, ties to lower id") {
    val a = IvfIndex.assign(emb, seeds).orderBy("vec_id")
      .as[(Long, Long)].collect().toSeq
    assert(a == Seq((0L, 0L), (1L, 1L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L)))
  }

  test("probe scan PRUNES at the partition level (PartitionFilters, not post-scan)") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    IvfIndex.build(emb, seeds, dir)
    // one directory per cluster on disk
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("cluster="))
    assert(parts.sorted.toSeq == Seq("cluster=0", "cluster=1"))
    val probe = IvfIndex.probe(spark, dir, Seq(1L))
    val plan = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = "PartitionFilters: \\[[^\\]]*cluster[^\\]]*= 1[^\\]]*\\]".r
    assert(pf.findFirstIn(plan).isDefined,
      s"expected a literal partition filter on cluster=1:\n$plan")
    // and the filter actually restricts rows read
    assert(probe.select("vec_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 5L))
  }

  test("nprobe artifact serve equals the in-session nprobe probe row-for-row") {
    // round 13 (verdict item 6): the persisted-centroid serve path at
    // nprobe=2 — save→load→widened probe must be bit-identical to the
    // in-session q_ivf_nprobe (both also share one DuckDB oracle, so
    // the driver's hash gate re-proves this at sf0.01)
    val a = graft.queries.AnnQueries.ivfNprobe.fn(spark, sf0001)
    val b = graft.queries.AnnQueries2.ivfNprobeArtifact.fn(spark, sf0001)
    assert(a.collect().toSeq == b.collect().toSeq)
    assert(graft.queries.AnnQueries2.ivfNprobeArtifact.oracle ==
      graft.queries.AnnQueries.ivfNprobe.oracle,
      "artifact twin must reuse the in-session oracle verbatim")
  }
}
