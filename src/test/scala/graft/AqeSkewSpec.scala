package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** AQE runtime skew-join splitting — the PLATFORM path for zipfian join
  * keys, beside the engine's hand-rolled two-stage salting
  * ([[graft.operators.Salting]], checked by `q_salted_agg`). A hot key
  * that funnels ~95% of a fact table into one post-shuffle partition is
  * detected at runtime (partition size > factor × median and >
  * threshold) and split across many reader partitions; the sort-merge
  * join is tagged `skew=true` and the straggler disappears. PLANS.md
  * carries the measured per-task shuffle-read before/after.
  */
class AqeSkewSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private class MaxShuffleRead extends SparkListener {
    @volatile var maxBytes = 0L
    @volatile var joinTasks = 0
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null && m.shuffleReadMetrics.totalBytesRead > 0) {
        joinTasks += 1
        maxBytes = math.max(maxBytes, m.shuffleReadMetrics.totalBytesRead)
      }
    }
  }

  /** ~200k rows, ~95% on key 0, ~64 B payload: the hot post-shuffle
    * partition is ~12 MB while the median is ~100 KB.
    */
  private def skewedJoin() = {
    val left = spark.range(0, 200000L)
      .select(when(col("id") % 20 < 19, 0L).otherwise(pmod(col("id"), lit(997L))).as("k"),
        // incompressible payload: shuffle bytes are lz4-compressed, so a
        // padded constant would hide the skew from the byte-based detector
        sha2(col("id").cast("string"), 256).as("payload"))
    val right = spark.range(0, 997L)
      .select(col("id").as("k"), concat(lit("d"), col("id").cast("string")).as("dim"))
    left.join(right, "k")
  }

  private def run(skewOn: Boolean): (Long, Int, String) = {
    val listener = new MaxShuffleRead
    spark.sparkContext.addSparkListener(listener)
    try {
      var plan = ""
      withConfs(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> skewOn.toString,
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512k",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.shuffle.partitions" -> "8") {
        val df = skewedJoin()
        // collect() executes df's OWN QueryExecution (count() would plan a
        // separate aggregate), so the adaptive final plan is inspectable
        assert(df.collect().length == 200000)
        plan = df.queryExecution.executedPlan.toString
      }
      Thread.sleep(2000) // listener bus drains asynchronously
      (listener.maxBytes, listener.joinTasks, plan)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("AQE splits the skewed partition at runtime (skew=true join, bounded task size)") {
    val (maxOff, tasksOff, planOff) = run(skewOn = false)
    val (maxOn, tasksOn, planOn) = run(skewOn = true)
    assert(!planOff.contains("skew=true"))
    assert(planOn.contains("skew=true"), s"expected a skew-tagged join:\n$planOn")
    // the straggler is gone: max per-task shuffle read drops by > 2x and
    // the join stage fans out over more tasks
    assert(maxOn * 2 <= maxOff,
      s"expected skew split to bound task input: off=$maxOff on=$maxOn")
    assert(tasksOn > tasksOff)
    info(s"max per-task shuffle read: ${maxOff / 1024} KiB -> ${maxOn / 1024} KiB; " +
      s"shuffle-reading tasks: $tasksOff -> $tasksOn")
  }
}
