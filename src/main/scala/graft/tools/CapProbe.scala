package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Empirical cap measurement for the forced-broadcast allow-list
  * (round 13): `BroadcastAudit.Allowed` documents WHY each hint-forced
  * operand is bounded; this tool measures the bound. Every allow-listed
  * query runs at two scale factors (10x apart) with AQE off and
  * auto-broadcast disabled, and each forced operand's actual row count
  * is read from the BroadcastExchange's `numOutputRows` metric after
  * execution. A scale-invariant operand reads ~1x growth; the
  * token-length histogram reads its documented doc-length bound;
  * anything near 10x would be a corpus-scaled operand hiding behind a
  * stale ledger entry. (The SNM sort-key histogram was exactly that
  * class — its round-13 measurement under the perturbed replica read
  * ~10x, and the rank now rides a range-sort + zipWithIndex instead of
  * any broadcast; see DedupQueries.snmBlocking.)
  *
  *   runMain graft.tools.CapProbe [sfSmall] [sfBig]
  */
object CapProbe {

  def main(args: Array[String]): Unit = {
    val sfSmall = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sfBig = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("cap-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val names = BroadcastAudit.Allowed.keys.map(_._1).toSeq.distinct.sorted
    val qs = graft.SparkEntry.registry.filter(q => names.contains(q.name))

    /** (query, sig) → forced-operand row count after executing at `sf`. */
    def measure(sf: String): Map[(String, String), Long] = {
      val out = collection.mutable.Map.empty[(String, String), Long]
      for (q <- qs) {
        try {
          val df = q.fn(spark, sf)
          // collect, not count: count() builds a FRESH QueryExecution,
          // leaving df.queryExecution's plan (and its metrics) unexecuted
          df.collect()
          val plan = df.queryExecution.executedPlan
          for (b <- plan.collect { case b: BroadcastExchangeExec => b }) {
            val sig = BroadcastAudit.signature(b.child)
            if (BroadcastAudit.Allowed.contains((q.name, sig)))
              for (m <- b.metrics.get("numOutputRows")) {
                val k = (q.name, sig)
                out(k) = math.max(out.getOrElse(k, 0L), m.value)
              }
          }
        } catch {
          case e: Throwable =>
            println(s"ERR $sf ${q.name}: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(100))
        }
      }
      out.toMap
    }

    val small = measure(sfSmall)
    val big = measure(sfBig)
    println(f"\n${"query"}%-26s ${"operand"}%-24s ${"sf_small"}%9s ${"sf_big"}%9s ${"growth"}%7s")
    var worst = 0.0
    for (((name, sig), nS) <- small.toSeq.sortBy(_._1)) {
      big.get((name, sig)) match {
        case Some(nB) =>
          val g = if (nS > 0) nB.toDouble / nS else Double.NaN
          if (!g.isNaN && g > worst) worst = g
          println(f"$name%-26s ${"[" + sig + "]"}%-24s $nS%9d $nB%9d $g%7.2f")
        case None =>
          println(f"$name%-26s ${"[" + sig + "]"}%-24s $nS%9d ${"-"}%9s ${"-"}%7s")
      }
    }
    val unmeasured = BroadcastAudit.Allowed.keys.toSet -- small.keySet -- big.keySet
    if (unmeasured.nonEmpty)
      println(s"\nnot observed as forced broadcasts (plan-level only, e.g. cartesian sides): " +
        unmeasured.toSeq.sorted.mkString(", "))
    println(f"\nworst growth over a 10x data step: $worst%.2fx")
    spark.stop()
  }
}
