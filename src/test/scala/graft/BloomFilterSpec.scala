package graft

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the third runtime-filtering
  * story beside AQE skew-split (AqeSkewSpec) and partition pruning
  * (IvfIndexSpec): when one join side is cut down by a selective
  * predicate, Catalyst builds a bloom filter over its join keys at
  * runtime and injects `bloom_filter_might_contain` on the OTHER
  * side's scan, so non-matching fact rows die before the shuffle. At
  * 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~few-percent slice a filtered dimension
  * actually selects. The thresholds below only undo the local-fixture
  * scaling (the application side must look scan-heavy, default 10 GB).
  */
class BloomFilterSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def selectiveJoin() = {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_totalprice") < 20000) // 57 of 1500 orders
      .select("o_orderkey")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
  }

  private def run(bloomOn: Boolean): (Long, Long, String) = {
    var rows = 0L; var pruned = -1L; var plan = ""
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> bloomOn.toString,
      // fixture is KB-scale; the default says "only bother for >10 GB scans"
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.enabled" -> "false") {      // static plan: metrics are directly addressable
      val df = selectiveJoin()
      rows = df.collect().length.toLong
      plan = df.queryExecution.executedPlan.toString
      df.queryExecution.executedPlan.foreach {
        case f: FilterExec if f.condition.toString.contains("might_contain") =>
          pruned = f.metrics("numOutputRows").value
        case _ =>
      }
    }
    (rows, pruned, plan)
  }

  test("selective dim filter injects bloom_filter_might_contain on the fact scan") {
    val (rowsOff, prunedOff, planOff) = run(bloomOn = false)
    val (rowsOn, prunedOn, planOn) = run(bloomOn = true)
    assert(rowsOff == rowsOn && rowsOn == 243L) // semantics unchanged
    assert(!planOff.contains("might_contain"))
    assert(planOn.contains("might_contain"), s"expected a runtime bloom filter:\n$planOn")
    assert(prunedOff == -1L) // no bloom filter node at all when off
    // 6000 fact rows enter; only matches (243) + false positives survive
    // to the shuffle — require at least a 4x reduction
    assert(prunedOn >= 243L && prunedOn <= 1500L,
      s"expected the bloom filter to pass ~243 of 6000 rows, got $prunedOn")
    info(s"fact rows crossing the shuffle: 6000 -> $prunedOn (join output $rowsOn)")
  }
}
