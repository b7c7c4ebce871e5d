package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 receipt harness for the packer prefix-sum rewrite
  * (`TextStatsQueries.seqPack` / `TextStatsQueries2.seqPackBpe`): the
  * ORIGINAL per-lang running-total window versus the segmented
  * two-pass scan (`operators.PrefixSum`), both producing the
  * q_seq_pack output. The window form's cost is linear — what the
  * slope gates check — but its PARALLELISM is #languages: one task
  * owns each language's whole doc stream. The probe reports wall time
  * and output row count (must be equal), plus the bin checksum so the
  * block layout is pinned identical.
  *
  *   runMain graft.tools.PackProbe <dir> [passes] [old|new|all]
  */
object PackProbe {

  import graft.functions.TextFunctions.tokens

  private def base(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tok"))

  /** The pre-round-13 shape, kept verbatim for the A/B receipt. */
  private def packOld(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base(docs).withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("lang"), col("doc_id"), col("n_tok"),
        expr("(cum - n_tok) div 512").as("bin"))
  }

  private def packNew(docs: DataFrame): DataFrame =
    graft.operators.PrefixSum.byShard(base(docs), "lang", Seq("doc_id"), "n_tok", "cum")
      .select(col("lang"), col("doc_id"), col("n_tok"),
        expr("(cum - n_tok) div 512").as("bin"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_x1000_pt")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val which = args.drop(2).headOption.getOrElse("all")
    val cpus = sys.env.getOrElse("GRAFT_PROF_CPUS", "16")
    val parts = sys.env.getOrElse("GRAFT_PROF_PARTITIONS", "64")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the probe A/Bs window vs SCAN — pin the scan dispatch so the
    // size-estimate fast path can't silently measure window-vs-window
    spark.conf.set(graft.operators.PrefixSum.ThresholdConf, "-1")

    def run(name: String, mk: => DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to passes) {
        val t0 = System.nanoTime()
        // checksum drives full computation AND pins the block layout
        val r = mk.agg(count(lit(1)), sum(col("bin") * col("n_tok"))).collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
        println(f"  pass: $name%-10s rows=${r.getLong(0)}%10d binsum=${r.getLong(1)}%16d $dt%8.2f s")
      }
      println(f"BEST $name%-10s $best%8.2f s")
    }

    val docs = graft.Tables(spark, dir, "documents")
    // the hot-shard adversary: ONE language owns the corpus — the
    // window form degenerates to a single task, the segmented scan
    // keeps p-way parallelism (same input to both forms)
    val oneLang = docs.withColumn("lang", lit("en"))
    which match {
      case "old" => run("old-pack", packOld(docs))
      case "new" => run("new-pack", packNew(docs))
      case "oldc" => run("old-1lang", packOld(oneLang))
      case "newc" => run("new-1lang", packNew(oneLang))
      case _ =>
        run("old-pack", packOld(docs))
        run("new-pack", packNew(docs))
    }
    spark.stop()
  }
}
