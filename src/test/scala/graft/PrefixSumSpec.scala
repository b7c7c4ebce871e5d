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

  test("explicit smallInputBytes beats the conf (the conf only covers default call sites)") {
    val t = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    // conf says "always window" (huge threshold); the caller explicitly
    // dispatched to the scan — the explicit decision must win
    spark.conf.set(PrefixSum.ThresholdConf, Long.MaxValue.toString)
    try {
      val out = PrefixSum.byShard(t, "lang", Seq("doc_id"), "n_tok", "cum",
        smallInputBytes = -1L)
      assert(out.queryExecution.optimizedPlan.collectFirst {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty,
        "an explicit -1 parameter must not be overridden by the conf")
    } finally spark.conf.unset(PrefixSum.ThresholdConf)
  }

  test("both dispatch paths declare the same output schema") {
    val t = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val fast = PrefixSum.byShard(t, "lang", Seq("doc_id"), "n_tok", "cum",
      PrefixSum.SmallInputBytes)
    val scan = PrefixSum.byShard(t, "lang", Seq("doc_id"), "n_tok", "cum", -1L)
    assert(fast.schema == scan.schema,
      s"schema must not flip with the size estimate:\n${fast.schema}\nvs\n${scan.schema}")
  }

  test("NULL shard key fails loudly on BOTH paths (no silent join-back row loss)") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L), (null: String, 2L, 3L), ("b", 3L, 4L))
      .toDF("lang", "doc_id", "n_tok")
    def chainContains(t: Throwable, s: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .exists(e => Option(e.getMessage).exists(_.contains(s)))
    val eScan = intercept[Exception] {
      PrefixSum.byShard(df, "lang", Seq("doc_id"), "n_tok", "cum", -1L).collect()
    }
    assert(chainContains(eScan, "NULL shard key"), s"scan path: $eScan")
    val eWin = intercept[Exception] {
      PrefixSum.byShard(df, "lang", Seq("doc_id"), "n_tok", "cum",
        PrefixSum.SmallInputBytes).collect()
    }
    assert(chainContains(eWin, "NULL shard key"), s"window path: $eWin")
  }

  test("binary shard keys are rejected (reference-hashed map keys)") {
    import spark.implicits._
    val df = Seq((Array[Byte](1), 1L, 2L)).toDF("lang", "doc_id", "n_tok")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.byShard(df, "lang", Seq("doc_id"), "n_tok", "cum", -1L)
    }
    assert(e.getMessage.contains("atomic column types only"))
  }

  test("row-identity shard key fails the driver-state cap, not the driver") {
    import spark.implicits._
    // > MaxDriverSubtotals distinct shards: pass 1 would ship
    // corpus-scale state through the driver — must fail with the cap
    // message instead of growing silently
    val n = PrefixSum.MaxDriverSubtotals + 1024
    val df = spark.range(n).select(col("id").as("shard"), col("id").as("o"),
      org.apache.spark.sql.functions.lit(1L).as("v"))
    val e = intercept[IllegalArgumentException] {
      PrefixSum.byShard(df, "shard", Seq("o"), "v", "cum", -1L).collect()
    }
    assert(e.getMessage.contains("few-valued"),
      s"cap message must name the contract, got: ${e.getMessage}")
  }

  test("globalRowNumber (scan path) equals the unpartitioned row_number window") {
    val t = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"))
    val got = PrefixSum.globalRowNumber(t,
        Seq(col("lang").desc, col("doc_id").asc), "rn", smallInputBytes = -1L)
      .select("lang", "doc_id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = t.withColumn("rn", row_number().over(
        Window.orderBy(col("lang").desc, col("doc_id").asc)).cast("long"))
      .select("lang", "doc_id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("globalRowNumber dispatch: lazy window on small input, RDD scan when forced") {
    val t = Tables(spark, sf0001, "documents").select(col("lang"), col("doc_id"))
    val ord = Seq(col("lang").desc, col("doc_id").asc)
    val fast = PrefixSum.globalRowNumber(t, ord, "rn")
    assert(fast.queryExecution.optimizedPlan.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.nonEmpty,
      "small input must stay a lazy window (no checkpoint, no extra jobs)")
    val scan = PrefixSum.globalRowNumber(t, ord, "rn", smallInputBytes = -1L)
    assert(scan.queryExecution.optimizedPlan.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty,
      "-1 must force the two-pass scan shape")
    // both paths: identical values AND identical declared schema
    assert(fast.schema == scan.schema,
      s"schema flips with the dispatch: ${fast.schema} vs ${scan.schema}")
    assert(fast.collect().map(_.toSeq).toSet == scan.collect().map(_.toSeq).toSet)
  }

  test("globalRowNumber re-shard determinism: 3 vs 17 shuffle partitions") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (s"t${i % 97}", i)).toDF("tok", "doc_id")
    def run(parts: String) = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", parts)
      import org.apache.spark.sql.GraftShim
      val d2 = GraftShim.rebind(s2, df.localCheckpoint(true))
      PrefixSum.globalRowNumber(d2, Seq(col("tok").asc, col("doc_id").asc), "rn",
          smallInputBytes = -1L)
        .select("tok", "doc_id", "rn").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(run("3") == run("17"))
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
