package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component decomposition probe for the BPE train→encode pair: times
  * each stage of `q_bpe_encode` separately at two replica scales, so a
  * super-linear full-query slope can be attributed to a stage instead
  * of guessed at ([[KcenterProbe]] precedent). Stages:
  *   learn    — the 5-round merge-learning loop (collect of the table)
  *   fold     — the one-pass merge-apply map (count of the encoded frame)
  *   vocab    — distinct post-merge tokens + total-order rank
  *   joinagg  — token→id join + per-doc checksum aggregate (full tail)
  */
object BpeProbe {
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
    import graft.queries.TextStatsQueries
    import graft.functions.TextFunctions.tokens

    println(f"${"dir"}%-34s ${"stage"}%-8s ${"sec"}%8s ${"rows"}%12s")
    dirs.foreach { dir =>
      def t[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
      }
      val base = graft.Tables(spark, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
      val (tl, merges) = t {
        TextStatsQueries.learnBpeMerges(spark, base, 5)
          .collect().sortBy(_.getLong(0))
          .map(r => (r.getString(1), r.getString(2)))
      }
      println(f"$dir%-34s ${"learn"}%-8s $tl%8.2f ${merges.length}%12d")
      val enc = base.select(col("doc_id"),
        merges.foldLeft(col("toks")) { case (c, (l, r)) =>
          graft.functions.HashExpressions.bpeMergeFast(c, l, r)
        }.as("toks"))
      val (tf, nf) = t(enc.count())
      println(f"$dir%-34s ${"fold"}%-8s $tf%8.2f $nf%12d")
      import spark.implicits._
      val v = enc.select(explode(col("toks")).as("tok")).distinct()
        .orderBy("tok").as[String].rdd.zipWithIndex()
        .map { case (tok, i) => (tok, i + 1L) }.toDF("tok", "id")
      val (tv, nv) = t(v.count())
      println(f"$dir%-34s ${"vocab"}%-8s $tv%8.2f $nv%12d")
      val e = enc.select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
      val (tj, nj) = t {
        e.join(v.hint("shuffle_hash"), "tok")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"), sum("id").cast("long").as("id_sum"))
          .count()
      }
      println(f"$dir%-34s ${"joinagg"}%-8s $tj%8.2f $nj%12d")
    }
    spark.stop()
  }
}
