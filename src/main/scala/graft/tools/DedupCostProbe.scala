package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.TextFunctions.tokens

/** Throwaway component timer for q_dedup_cost's third-decade decade:
  * times each stage of the query at a given fixture dir so the
  * super-linear term can be named instead of guessed.
  */
object DedupCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("GRAFT_PROBE_CPUS", "16")
    val parts = sys.env.getOrElse("GRAFT_PROBE_PARTITIONS", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val docs = Tables(spark, dir, "documents")
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    time("hs") { hs.count() }
    val jp = Dedup.ngramJaccardPairs(hs, "doc_id", 0.0)
      .withColumn("cont", col("i").cast("double") / least(col("ca"), col("cb")))
    time("jp(backbone)") { jp.count() }
    val flags = jp
      .groupBy(col("idb").as("doc_id"))
      .agg(max(when(col("jaccard") >= 0.5, 1).otherwise(0)).as("near"),
        max(when(col("cont") >= 0.8, 1).otherwise(0)).as("cnt"))
    time("flags") { flags.count() }
    val exactDrop = docs
      .select(col("doc_id"), Dedup.contentKey(col("text")).as("ck"))
      .withColumn("m", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("ck")))
      .filter(col("doc_id") > col("m")).select(col("doc_id"))
    time("exactDrop") { exactDrop.count() }
    val tok = docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("nt"))
    time("tok") { tok.count() }
    time("full") { graft.SparkEntry.queries("q_dedup_cost")(spark, dir).count() }
    spark.stop()
  }
}
