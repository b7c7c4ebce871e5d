package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** The segmented prefix sum must be value-identical to the window form
  * it replaces — same shards, same unique total order, same inclusive
  * left-to-right sums — including when one shard dominates (the
  * parallelism case the rewrite exists for) and across re-sharding.
  */
class PrefixSumSpec extends SparkSpec {

  private def windowForm(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col("n_tok")).over(w))
  }

  test("equals the per-shard window on the documents table (scan path)") {
    val t = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    // smallInputBytes = -1 forces the two-pass scan — the at-scale path
    val got = PrefixSum.byShard(t, "lang", Seq("doc_id"), "n_tok", "cum",
        smallInputBytes = -1L)
      .select("lang", "doc_id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = windowForm(t)
      .select("lang", "doc_id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("small-input fast path returns the same values as the scan path") {
    val t = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    def form(threshold: Long) =
      PrefixSum.byShard(t, "lang", Seq("doc_id"), "n_tok", "cum", threshold)
    def vals(df: org.apache.spark.sql.DataFrame) =
      df.select("lang", "doc_id", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val fast = form(PrefixSum.SmallInputBytes)
    // the default path on a sandbox-SF frame IS the lazy window (zero
    // extra jobs); the forced path is the segmented scan (RDD leaf).
    // Assert on the LOGICAL plan: with AQE on, the physical root is an
    // opaque AdaptiveSparkPlanExec that collect() does not descend into
    assert(fast.queryExecution.optimizedPlan.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.nonEmpty)
    val scan = form(-1L)
    assert(scan.queryExecution.optimizedPlan.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty)
    assert(vals(fast) == vals(scan))
  }

  test("the conf override forces the scan through default call sites") {
    val t = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    spark.conf.set(PrefixSum.ThresholdConf, "-1")
    try {
      val out = PrefixSum.byShard(t, "lang", Seq("doc_id"), "n_tok", "cum")
      assert(out.queryExecution.optimizedPlan.collectFirst {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty)
    } finally spark.conf.unset(PrefixSum.ThresholdConf)
  }

  test("one dominant shard: sums still exact, all partitions used") {
    import spark.implicits._
    // 10k rows, 99% in one shard — the #shards parallelism ceiling case
    val df = (1L to 10000L).map(i =>
        (if (i % 100 == 0) "rare" else "hot", i, i % 7 + 1))
      .toDF("lang", "doc_id", "n_tok")
    val got = PrefixSum.byShard(df, "lang", Seq("doc_id"), "n_tok", "cum",
      smallInputBytes = -1L)
    val want = windowForm(df)
    assert(got.select("lang", "doc_id", "cum").collect().toSet ==
      want.select("lang", "doc_id", "cum").collect().toSet)
    // the sorted frame spreads across many partitions even though one
    // shard dominates (a lang window would use exactly 2 tasks)
    assert(got.rdd.getNumPartitions > 2)
  }

  test("empty input yields an empty result with the output column") {
    import spark.implicits._
    val df = Seq.empty[(String, Long, Long)].toDF("lang", "doc_id", "n_tok")
    val out = PrefixSum.byShard(df, "lang", Seq("doc_id"), "n_tok", "cum")
    assert(out.columns.contains("cum"))
    assert(out.count() == 0)
  }

  test("re-shard determinism: 3 vs 17 shuffle partitions, same values") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (s"l${i % 3}", i, i % 5 + 1))
      .toDF("lang", "doc_id", "n_tok")
    def run(parts: String) = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", parts)
      import org.apache.spark.sql.GraftShim
      val d2 = GraftShim.rebind(s2, df.localCheckpoint(true))
      PrefixSum.byShard(d2, "lang", Seq("doc_id"), "n_tok", "cum",
          smallInputBytes = -1L)
        .select("lang", "doc_id", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(run("3") == run("17"))
  }
}
