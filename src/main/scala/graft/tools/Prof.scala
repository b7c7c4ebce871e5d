package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing: runMain graft.tools.Prof <sfDir> <name>...
  * Env knobs: GRAFT_PROF_CPUS (default 4), GRAFT_PROF_PARTITIONS
  * (default = cpus), GRAFT_PROF_LOG (default ERROR — set INFO to read
  * per-stage timings when decomposing a slow probe).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("GRAFT_PROF_CPUS", "4")
    val parts = sys.env.getOrElse("GRAFT_PROF_PARTITIONS", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_PROF_LOG", "ERROR"))
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune columns (and
      // sometimes whole subtrees), so map-heavy queries would time the
      // bare scan instead of their compute — the same full-evaluation
      // sink Bench uses (optimization guide §1.4)
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name -> noop sink in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
