package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Third-decade probe for the quality-triad feature-frame persist
  * (round-11 verdict item 3): `trajectory` keeps a 66-column integer
  * frame in MEMORY_AND_DISK_SER on the arithmetic that 16 gradient
  * reads amortize one fill — measured at 100x; the BPE cache whale
  * proved that exact shape can invert at 1000x (fill slope 5.07). This
  * probe measures, on a perturbed replica at the chosen factor:
  *
  *  - FILL: one columnar cache fill of the feature frame (persist +
  *    count on a fresh session-unique frame),
  *  - READ: one gradient pass over the persisted frame (warm min-of-2),
  *  - RECOMPUTE: the same gradient pass over an unpersisted frame —
  *    tokenize + bucket histogram re-run inside the scan (warm
  *    min-of-2),
  *
  * and reports the ledger comparison the persist decision rule wants:
  * persist path = fill + Steps·read, recompute path = Steps·recompute.
  *
  * Usage: GRAFT_PROBE_SRC=/root/testdata/sf0.1 GRAFT_PROBE_CPUS=16 \
  *        java ... graft.tools.QualityProbe [factor]
  */
object QualityProbe {

  private val Steps = 16

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val src = sys.env.getOrElse("GRAFT_PROBE_SRC", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("GRAFT_PROBE_DST",
      s"/tmp/graft_scale_x${factor}_pt")
    val cpus = sys.env.getOrElse("GRAFT_PROBE_CPUS", "16")
    val parts = sys.env.getOrElse("GRAFT_PROBE_PARTITIONS", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleProbe.buildReplica(spark, src, dst, factor, perturbText = true)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: => Unit): Double = math.min(time(f), time(f))

    val w0 = Array.fill(68)(0L)
    println(f"${"side"}%-6s ${"fill_s"}%8s ${"read_s"}%8s ${"recomp_s"}%9s " +
      f"${"persist16"}%10s ${"recomp16"}%9s")
    val rows = Seq("1x" -> src, s"${factor}x" -> dst).map { case (tag, dir) =>
      val docs = graft.Tables(spark, dir, "documents")
      def freshFeats = graft.queries.CurationQueries33.featuresOf(docs)
      // warm the scan (page cache + codegen) before any timing
      freshFeats.count()
      // RECOMPUTE: gradient pass over the unpersisted frame
      val recompute = minOf2(graft.queries.CurationQueries33.gradientStep(freshFeats, w0))
      // FILL: single-timed (a second fill would read the first's cache);
      // count() materializes the full 66-column InMemoryRelation
      val cached = freshFeats.persist(StorageLevel.MEMORY_AND_DISK_SER)
      val fill = time(cached.count())
      // READ: gradient pass over the persisted frame
      val read = minOf2(graft.queries.CurationQueries33.gradientStep(cached, w0))
      cached.unpersist(true)
      val persistPath = fill + Steps * read
      val recomputePath = Steps * recompute
      println(f"$tag%-6s $fill%8.2f $read%8.2f $recompute%9.2f " +
        f"$persistPath%10.2f $recomputePath%9.2f")
      (fill, read, recompute, persistPath, recomputePath)
    }
    val (f1, r1, c1, p1, n1) = rows(0)
    val (fn, rn, cn, pn, nn) = rows(1)
    println(f"decades: fill=${fn / f1 / factor}%.2f read=${rn / r1 / factor}%.2f " +
      f"recompute=${cn / c1 / factor}%.2f persist16=${pn / p1 / factor}%.2f " +
      f"recompute16=${nn / n1 / factor}%.2f")
    println(s"verdict at ${factor}x: " +
      (if (pn <= nn) f"PERSIST wins (${pn}%.1f s vs ${nn}%.1f s)"
       else f"RECOMPUTE wins (${nn}%.1f s vs ${pn}%.1f s)"))
    spark.stop()
  }
}
