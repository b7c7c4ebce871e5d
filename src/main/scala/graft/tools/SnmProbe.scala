package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 receipt harness for the SNM rank rewrite
  * (`DedupQueries.snmBlocking`): the ORIGINAL rank shape — a broadcast
  * cumulative histogram of 3-token sort-key prefixes + row_number
  * PARTITIONED by prefix — versus the range-sort + zipWithIndex shape
  * now in the registry, both feeding the identical banded within-w
  * candidate join. The old shape's broadcast operand is keyed by
  * document prefix, so a vocab-growing corpus grows it linearly
  * (measured: 473 → 4,730 distinct prefixes across a 10x perturbed
  * step — exactly 10.00x), and a hot prefix (the mega-dup boilerplate
  * page) funnels its cluster through ONE row_number task. The probe
  * reports wall time per variant plus the candidate-set count, which
  * MUST be equal — (sk, doc_id) is a unique total order, so both rank
  * definitions coincide.
  *
  *   runMain graft.tools.SnmProbe <dir> [passes] [old|new|all]
  */
object SnmProbe {

  import graft.functions.TextFunctions.tokens

  private def skTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_join(slice(tokens(col("text")), 1, 3), " ").as("sk"))

  /** The pre-round-13 rank shape, kept verbatim for the A/B receipt. */
  private def rankOld(skt: DataFrame): DataFrame = {
    val hist = skt.groupBy("sk").agg(count(lit(1)).as("c"))
    val wcum = Window.orderBy("sk").rowsBetween(Long.MinValue, 0)
    val bef = hist.withColumn("bfr", sum("c").over(wcum) - col("c"))
      .select("sk", "bfr")
    skt.join(broadcast(bef), "sk")
      .withColumn("rwithin", row_number().over(
        Window.partitionBy("sk").orderBy("doc_id")))
      .select(col("doc_id"), (col("bfr") + col("rwithin")).as("rn"))
  }

  /** The round-13 registry shape: range-sort + zipWithIndex. */
  private def rankNew(skt: DataFrame): DataFrame = {
    val spark = skt.sparkSession
    import spark.implicits._
    skt.select(col("sk"), col("doc_id")).as[(String, Long)]
      .orderBy("sk", "doc_id").rdd.zipWithIndex()
      .map { case ((_, id), i) => (id, i + 1L) }.toDF("doc_id", "rn")
  }

  /** The round-14 registry shape: PrefixSum.globalRowNumber —
    * identical range-sort, but per-partition offsets over InternalRow
    * instead of zipWithIndex's per-row Row encode/decode.
    */
  private def rankGr(skt: DataFrame): DataFrame =
    graft.operators.PrefixSum.globalRowNumber(
        skt.select(col("sk"), col("doc_id")),
        Seq(col("sk").asc, col("doc_id").asc), "rn")
      .select(col("doc_id"), col("rn"))

  /** The shared banded within-w=4 candidate join. */
  private def candidates(rnk: DataFrame): DataFrame = {
    val a = rnk.select(col("doc_id").as("ida"), col("rn").as("ra"),
      expr("rn DIV 4").as("g"))
    val b = rnk.select(col("doc_id").as("idb"), col("rn").as("rb"),
        explode(array(expr("rn DIV 4"), expr("rn DIV 4 - 1"))).as("g"))
    a.join(b, "g")
      .filter((col("rb") - col("ra")).between(1, 4))
      .select(col("ida"), col("idb"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_x100_pt")
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

    def run(name: String, mk: => DataFrame): Unit = {
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to passes) {
        val t0 = System.nanoTime()
        rows = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
        println(f"  pass: $name%-10s $rows%12d rows  $dt%8.2f s")
      }
      println(f"BEST $name%-10s $best%8.2f s  ($rows rows)")
    }

    val docs = graft.Tables(spark, dir, "documents")
    val skt = skTable(docs)
    which match {
      case "old" => run("old-cand", candidates(rankOld(skt)))
      case "new" => run("new-cand", candidates(rankNew(skt)))
      case "gr" => run("gr-cand", candidates(rankGr(skt)))
      case _ =>
        run("old-cand", candidates(rankOld(skt)))
        run("new-cand", candidates(rankNew(skt)))
        run("gr-cand", candidates(rankGr(skt)))
    }
    spark.stop()
  }
}
