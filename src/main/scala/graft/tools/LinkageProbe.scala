package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes q_record_linkage's cost: blocked-join pair generation vs
  * the per-pair edit distance (banded vs full DP), and the block-size
  * histogram that the blocking-key design argument rests on.
  * Usage: runMain graft.tools.LinkageProbe <sfDir>
  */
object LinkageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c0 = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"),
        substring(col("c_name"), 1, 14).as("blk"),
        floor(col("c_acctbal") * 100).as("bal_cents"))
    val a = c0.select(col("c_custkey").as("key_a"), col("c_name").as("name_a"),
      col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
      col("blk").as("blk_a"), col("bal_cents").as("bal_a"))
    val b = c0.select(col("c_custkey").as("key_b"), col("c_name").as("name_b"),
      col("c_nationkey").as("nk2"), col("c_mktsegment").as("seg2"),
      col("blk").as("blk_b"), col("bal_cents").as("bal_b"))
    val j = a.join(b, col("nk") === col("nk2") && col("seg") === col("seg2") &&
      col("blk_a") === col("blk_b") && col("key_a") < col("key_b"))
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag -> $n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    c0.groupBy("c_nationkey", "c_mktsegment", "blk").count()
      .agg(count(lit(1)).as("n_blocks"), max("count").as("max_block"),
        avg("count").as("avg_block"))
      .show(false)
    t("warmup")(j.count()); t("join-only")(j.count())
    t("join+banded-lev")(j.withColumn("d", levenshtein(col("name_a"), col("name_b"), 2))
      .filter(col("d") >= 0).count())
    t("join+banded-lev")(j.withColumn("d", levenshtein(col("name_a"), col("name_b"), 2))
      .filter(col("d") >= 0).count())
    t("join+full-lev")(j.filter(levenshtein(col("name_a"), col("name_b")) <= 2).count())
    // the block key pins the first 14 chars equal, and edit distance is
    // invariant under common-prefix stripping — same result, 4-char DP
    t("join+suffix-lev")(j.withColumn("d",
        levenshtein(substring(col("name_a"), 15, 1000),
          substring(col("name_b"), 15, 1000), 2))
      .filter(col("d") >= 0).count())
    t("join+suffix-lev")(j.withColumn("d",
        levenshtein(substring(col("name_a"), 15, 1000),
          substring(col("name_b"), 15, 1000), 2))
      .filter(col("d") >= 0).count())
    spark.stop()
  }
}
