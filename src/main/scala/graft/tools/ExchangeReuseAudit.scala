package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}

/** Registry-wide DUPLICATE-EXCHANGE audit (round 13) — the
  * generalization of the containment-backbone find: two plan branches
  * that shuffle canonically IDENTICAL subtrees should share one
  * exchange via ReuseExchange; when a small constraint-inference or
  * pruning difference breaks canonical equality, the corpus pays the
  * shuffle twice and nothing warns. This tool builds every registry
  * plan with AQE off (static plans — reuse is decided by canonical
  * equality either way) and reports ShuffleExchanges whose child trees
  * canonicalize equal yet appear as separate exchanges.
  *
  * Near-miss reporting: exchanges whose children share the same leaf
  * scan set and output column count but canonicalize UNEQUAL are the
  * q_overlap_join failure mode (an inferred isnotnull on one branch);
  * those are printed as `near` lines for manual adjudication — some
  * are legitimately different computations over the same scan.
  *
  *   runMain graft.tools.ExchangeReuseAudit [sfDir]
  */
object ExchangeReuseAudit {

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("exchange-reuse-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    var dups = 0
    for (q <- graft.SparkEntry.registry) {
      try {
        val plan = q.fn(spark, sf).queryExecution.executedPlan
        val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
        val reused = plan.collect { case r: ReusedExchangeExec => r }.size
        // exact duplicates: same canonicalized exchange appearing twice
        val byCanon = exchanges.groupBy(_.canonicalized)
        for ((_, group) <- byCanon if group.size > 1) {
          dups += 1
          println(s"DUP  ${q.name}: ${group.size} identical exchanges not reused " +
            s"(partitioning ${group.head.outputPartitioning}); reusedInPlan=$reused")
          println("     " + group.head.child.collectLeaves().map(_.nodeName).distinct
            .mkString("+") + " cols=[" +
            group.head.child.output.map(_.name).take(8).mkString(",") + "]")
        }
        // near misses: same leaves, same column names, unequal canon
        val sig = exchanges.map { e =>
          (e.child.collectLeaves().map(_.verboseString(20)).sorted.mkString("|"),
            e.child.output.map(_.name).sorted.mkString(","), e)
        }
        for (((leaves, cols), group) <- sig.groupBy(t => (t._1, t._2))
             if group.size > 1 && group.map(_._3.canonicalized).distinct.size > 1) {
          println(s"near ${q.name}: ${group.size} same-leaf/same-cols exchanges, " +
            s"unequal canon cols=[$cols]")
        }
      } catch {
        case e: Throwable =>
          println(s"ERR  ${q.name}: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    println(s"\nexact duplicate-exchange groups: $dups")
    spark.stop()
  }
}
