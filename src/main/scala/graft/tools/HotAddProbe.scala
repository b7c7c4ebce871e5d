package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineDistance
import graft.operators.IvfIndex
import graft.streaming.AnnStreams

/** Round-15 receipt harness (verdict item 5): HOT-ADD RECALL DRIFT.
  *
  * `IvfIndex.appendVectors` routes new vectors with the CURRENT
  * version's codebook — correct by construction, but as the appended
  * fraction grows the codebook was trained on a shrinking share of the
  * data it partitions, and probe recall can degrade. This measures
  * recall@10 (vs exact brute-force cosine over the same corpus) for a
  * STALE-codebook index (trained on the base, appends hot-added) vs a
  * FRESH rebuild (codebook retrained on base+appends) at append
  * fractions 10/50/100% of the base, nprobe ∈ {1, 2, 4}, k=16
  * clusters, queries drawn from the appended region (where stale
  * routing is worst). The appends carry a deliberate distribution
  * shift (+0.35 on the first 8 of 64 dims — a new crawl slice that
  * does not look like the old corpus); an i.i.d. append stream would
  * show no drift by symmetry, and the receipt must measure the regime
  * where the compaction rule actually binds.
  *
  *   runMain graft.tools.HotAddProbe [sfDir]
  *
  * The measured numbers KILLED the naive "compact when appends exceed
  * X%" rule (i.i.d. appends are recall-neutral at any fraction) and
  * derived the ASSIGNMENT-HISTOGRAM-DRIFT trigger documented on
  * [[IvfIndex.appendVectors]] and enforced by
  * [[IvfIndex.needsCompaction]]; PLANS.md round 15 carries the table.
  */
object HotAddProbe {

  private val K = 10
  private val Clusters = 16

  /** k evenly-spaced training vectors → one Lloyd update (the
    * `q_kmeans` codebook math) over the SAME training corpus.
    */
  private def codebook(train: DataFrame, n: Long): DataFrame = {
    val step = math.max(1L, n / Clusters)
    val seeds0 = graft.operators.PrefixSum.globalRowNumber(
        train, Seq(col("vec_id").asc), "rn", smallInputBytes = Long.MaxValue)
      .filter((col("rn") - 1) % step === 0 && col("rn") <= step * Clusters)
      .select(((col("rn") - 1) / step).cast("long").as("cluster"),
        col("embedding").as("cv"))
    graft.queries.AnnQueries.lloydUpdate(
      train, IvfIndex.assign(train, seeds0)).localCheckpoint()
  }

  private def recallAt10(served: DataFrame, exact: DataFrame): Double = {
    val hits = served.select(col("qid"), col("nid"))
      .join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"))
      .count()
    val nq = exact.select("qid").distinct().count()
    hits.toDouble / (nq * K)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // GRAFT_HOTADD_SHIFT=0 runs the i.i.d.-append CONTROL: no
    // distribution shift, so stale ≈ fresh by symmetry — separating
    // what staleness costs (nothing, i.i.d.) from what DRIFT costs
    val shift = sys.env.get("GRAFT_HOTADD_SHIFT").map(_.toDouble).getOrElse(0.35)
    val cpus = sys.env.getOrElse("GRAFT_PROF_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .localCheckpoint()
    val nBase = base.count()
    val staleCb = codebook(base, nBase)
    println(s"[hotadd] base=$nBase vectors, k=$Clusters clusters")

    for (frac <- Seq(0.1, 0.5, 1.0)) {
      val nApp = (nBase * frac).toLong
      // drifted appends: fresh ids, first 8 dims shifted
      val appends = base.filter(col("vec_id") < nApp)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x + when(i < 8, lit(shift)).otherwise(lit(0.0))).as("embedding"))
        .localCheckpoint()
      val corpus = base.unionByName(appends).localCheckpoint()
      val queries = appends.filter(col("vec_id") % 7 === 0).limit(32)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .localCheckpoint()
      // exact ground truth over the full corpus (self-match excluded,
      // the servedTopK contract)
      val exact = corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          cosineDistance(col("embedding"), col("qv")).as("dist"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dist"), col("nid"))))
        .filter(col("rank") <= K)
        .localCheckpoint()

      val tmp = java.nio.file.Files.createTempDirectory(s"hotadd_$frac").toString
      // STALE: base index + hot-added appends, both routed by the
      // base-trained codebook (the real appendVectors path)
      IvfIndex.publishVersion(base, staleCb, s"$tmp/stale", "v1")
      IvfIndex.appendVectors(appends, s"$tmp/stale")
      // FRESH: retrained codebook over base+appends, full rebuild
      val freshCb = codebook(corpus, nBase + nApp)
      IvfIndex.publishVersion(corpus, freshCb, s"$tmp/fresh", "v1")

      for (nprobe <- Seq(1, 2, 4)) {
        val stale = AnnStreams.servedTopK(
          queries, staleCb, s"$tmp/stale/v1/index", K, nprobe)
        val fresh = AnnStreams.servedTopK(
          queries, freshCb, s"$tmp/fresh/v1/index", K, nprobe)
        println(f"[hotadd] frac=$frac%4.1f nprobe=$nprobe  " +
          f"stale=${recallAt10(stale, exact)}%6.4f  " +
          f"fresh=${recallAt10(fresh, exact)}%6.4f")
      }
    }
    spark.stop()
  }
}
