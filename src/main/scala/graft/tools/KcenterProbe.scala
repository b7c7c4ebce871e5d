package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the k-center claim that matters at large K: the literal
  * Gonzalez form pays O(k·d) per point per round (Θ(K²) total corpus
  * work), the running-min-dist form O(d) per round (Θ(K) total). Run:
  * `runMain graft.tools.KcenterProbe <sfDir> [k1 k2 ...]` — prints
  * total and per-round seconds for both variants at each K; flat
  * per-round cost vs K for the incremental form is the pass criterion.
  */
object KcenterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(8, 32)
    val cpus = sys.env.getOrElse("GRAFT_PROF_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the scan + codegen once so the first timed cell isn't cold
    graft.queries.CurationQueries32.kcenterRun(spark, dir, 3, incremental = false).count()
    println(f"${"variant"}%-12s ${"K"}%5s ${"total_s"}%9s ${"per_round_s"}%12s")
    // the literal form is Θ(K²·d·N) BY CONSTRUCTION — running it at
    // coreset-sized K would measure the known quadratic, not the
    // running-min form's claim; skip it past K=64 (round-11 probe at
    // K∈{256,1024} exists to check the incremental form's per-round
    // FLATNESS, including driver-side plan-growth effects)
    for (k <- ks; inc <- Seq(false, true); if inc || k <= 64) {
      val t0 = System.nanoTime()
      graft.queries.CurationQueries32.kcenterRun(spark, dir, k, incremental = inc).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"${if (inc) "running-min" else "literal"}%-12s $k%5d $t%9.2f ${t / (k - 1)}%12.3f")
    }
    spark.stop()
  }
}
