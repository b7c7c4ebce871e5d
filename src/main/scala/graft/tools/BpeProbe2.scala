package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Controlled experiments isolating the super-linear term in the BPE
  * training round (measured decade 1.65 on the warm full loop):
  *   scan    — parquet scan + tokenize + count (linearity baseline)
  *   paircnt — round-1 adjacent-pair count, STRING keys (current form)
  *   pairlng — same aggregate keyed on xxhash64 longs (vectorized map)
  *   cache   — MEMORY_AND_DISK_SER fill of the token frame
  * Each stage timed twice warm, min reported, at each dir.
  */
object BpeProbe2 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_scale_x100_pt", "/tmp/graft_scale_x1000_pt")
    val parts = sys.env.getOrElse("GRAFT_PROBE_PARTITIONS", "160")
    val cpus = sys.env.getOrElse("GRAFT_PROBE_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFunctions.tokens

    println(f"${"dir"}%-34s ${"stage"}%-8s ${"sec"}%8s ${"rows"}%12s")
    dirs.foreach { dir =>
      def t2(f: => Long): (Double, Long) = {
        var rows = 0L
        val secs = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); rows = f; (System.nanoTime() - t0) / 1e9
        }
        (secs.min, rows)
      }
      val base = graft.Tables(spark, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))

      val (ts, ns) = t2(base.count())
      println(f"$dir%-34s ${"scan"}%-8s $ts%8.2f $ns%12d")

      val pairs = base.filter(size(col("toks")) >= 2)
        .select(col("toks"), explode(sequence(lit(1), size(col("toks")) - 1)).as("pos"))
        .select(element_at(col("toks"), col("pos")).as("l"),
          element_at(col("toks"), col("pos") + 1).as("r"))
      val (tp, np) = t2(pairs.groupBy("l", "r").agg(count(lit(1)).as("cnt")).count())
      println(f"$dir%-34s ${"paircnt"}%-8s $tp%8.2f $np%12d")

      val (tl, nl) = t2(pairs.groupBy(xxhash64(col("l")).as("hl"), xxhash64(col("r")).as("hr"))
        .agg(count(lit(1)).as("cnt")).count())
      println(f"$dir%-34s ${"pairlng"}%-8s $tl%8.2f $nl%12d")

      val (tc, nc) = t2 {
        val c = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        val n = c.count()
        c.unpersist(true)
        n
      }
      println(f"$dir%-34s ${"cache"}%-8s $tc%8.2f $nc%12d")
    }
    spark.stop()
  }
}
