package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-13 receipt harness for the containment-family shuffle cut
  * (verdict item 5): runs the ROUND-12 backbone (df-window + per-doc
  * sorted-ARRAY prefix build + candidate join re-exchanging the raw
  * posting table) and the ROUND-13 backbone (one shared h-repartition
  * + rank-window prefix + ReusedExchange candidate join —
  * `CurationQueries13.containmentEdges`) side by side on the same
  * corpus dir, reporting wall time, total shuffle bytes WRITTEN, and
  * spill (memory + disk) summed over all tasks. Shuffle-write is the
  * direct evidence of the exchange cut; spill is the single-box disk
  * pressure the x1000 postmortem hit.
  *
  *   runMain graft.tools.OverlapProbe <dir> [passes]
  */
object OverlapProbe {

  final class Metrics extends SparkListener {
    val shuffleWrite = new AtomicLong
    val shuffleRead = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = {
      shuffleWrite.set(0); shuffleRead.set(0); memSpill.set(0); diskSpill.set(0)
    }
  }

  /** The round-12 shape, kept verbatim for the A/B receipt. */
  private def edgesR12(docs: DataFrame): DataFrame = {
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    val sorted = hs
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("sh"))
    val pref = sorted.select(col("doc_id"),
      explode(expr("slice(sh, 1, CAST(size(sh) - (8 * size(sh) + 9) DIV 10 + 1 AS INT))"))
        .as("p"))
      .select(col("doc_id").as("pid"), col("p.h").as("h"))
    val cand = pref.join(hs.select(col("doc_id").as("fid"), col("h")), "h")
      .filter(col("pid") =!= col("fid"))
      .select(least(col("pid"), col("fid")).as("ida"),
        greatest(col("pid"), col("fid")).as("idb"))
      .distinct()
    Dedup.jaccardForPairsSets(cand,
        Dedup.shingleSets(docs, "doc_id", "text", 3), "doc_id")
      .withColumn("cont", col("i").cast("double") / least(col("ca"), col("cb")))
      .filter(col("cont") >= 0.8)
      .select(col("ida"), col("idb"), col("cont"))
  }

  /** Hybrid: r12's hash-agg array prefix (no doc-keyed window sorts)
    * + r13's shared h-exchange reused by the candidate join.
    */
  private def edgesHybrid(docs: DataFrame): DataFrame = {
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    val hsH = hs.filter(col("doc_id").isNotNull).repartition(col("h"))
    val sorted = hsH
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("sh"))
    val pref = sorted.select(col("doc_id"),
      explode(expr("slice(sh, 1, CAST(size(sh) - (8 * size(sh) + 9) DIV 10 + 1 AS INT))"))
        .as("p"))
      .select(col("doc_id").as("pid"), col("p.h").as("h"))
    val cand = pref.join(hsH.select(col("doc_id").as("fid"), col("h")), "h")
      .filter(col("pid") =!= col("fid"))
      .select(least(col("pid"), col("fid")).as("ida"),
        greatest(col("pid"), col("fid")).as("idb"))
      .distinct()
    Dedup.jaccardForPairsSets(cand,
        Dedup.shingleSets(docs, "doc_id", "text", 3), "doc_id")
      .withColumn("cont", col("i").cast("double") / least(col("ca"), col("cb")))
      .filter(col("cont") >= 0.8)
      .select(col("ida"), col("idb"), col("cont"))
  }

  /** Round-14 candidate (verdict item 1): DICTIONARY-ENCODED postings.
    * Dense ids replace the incompressible 8-byte polyhash in every wide
    * stage after the first h-exchange:
    *
    *   - dict (h → hid, df) builds from a PARTIAL-AGGREGATED
    *     `groupBy(h)` over the raw posting table (map-side combine
    *     collapses duplicate h before the exchange — a vocab-scale
    *     write, NOT posting-scale) and ranks via the eager InternalRow
    *     globalRowNumber, so the materialized RDD gives BOTH enc
    *     consumers identical ids (a lazy monotonically_increasing_id
    *     would re-assign on recompute and silently break the
    *     candidate join).
    *   - enc = postings ⋈ dict on h: the posting side rides the ONE
    *     explicit h-repartition (ReusedExchange, like r13), the dict
    *     side is a vocab-sized exchange (also reused between the two
    *     enc consumers).
    *   - the per-doc arrays carry struct(df int saturated, hid) —
    *     12 B raw vs 16, and dense small-valued ids compress where
    *     random polyhash longs cannot.
    *   - the candidate join keys on hid for both sides. COST vs r13:
    *     the full side no longer reuses the h-exchange (hid ≠ h), so
    *     it pays a NEW posting-mass exchange of compressible ids —
    *     the measurement decides whether the dense-id compression
    *     buys more than the lost reuse.
    */
  private def edgesDict(docs: DataFrame): DataFrame = {
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    val hsH = hs.filter(col("doc_id").isNotNull).repartition(col("h"))
    val dict = graft.operators.PrefixSum.globalRowNumber(
      hs.groupBy("h").agg(count(lit(1)).as("df")), Seq(col("h").asc), "hid")
    val enc = hsH.join(dict, "h")
      .select(col("doc_id"), col("hid"),
        least(col("df"), lit(Int.MaxValue.toLong)).cast("int").as("df"))
    val sorted = enc.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("hid")))).as("sh"))
    val pref = sorted.select(col("doc_id"),
      explode(expr("slice(sh, 1, CAST(size(sh) - (8 * size(sh) + 9) DIV 10 + 1 AS INT))"))
        .as("p"))
      .select(col("doc_id").as("pid"), col("p.hid").as("hid"))
    val cand = pref.join(enc.select(col("doc_id").as("fid"), col("hid")), "hid")
      .filter(col("pid") =!= col("fid"))
      .select(least(col("pid"), col("fid")).as("ida"),
        greatest(col("pid"), col("fid")).as("idb"))
      .distinct()
    Dedup.jaccardForPairsSets(cand,
        Dedup.shingleSets(docs, "doc_id", "text", 3), "doc_id")
      .withColumn("cont", col("i").cast("double") / least(col("ca"), col("cb")))
      .filter(col("cont") >= 0.8)
      .select(col("ida"), col("idb"), col("cont"))
  }

  /** Round-14 fallback cut: the r13 topology VERBATIM (shared
    * h-exchange + ReusedExchange candidate join — nothing re-keys), but
    * the per-doc array structs carry df as a SATURATED INT (4 bytes
    * fewer per posting through the doc-keyed exchange; ordering
    * unchanged for every df < 2^31, and ultra-hot shingles past the
    * saturation point sort last regardless — they never enter a
    * prefix).
    */
  private def edgesDfInt(docs: DataFrame): DataFrame = {
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    val hsH = hs.filter(col("doc_id").isNotNull).repartition(col("h"))
    val sorted = hsH
      .withColumn("df", least(count(lit(1)).over(Window.partitionBy(col("h"))),
        lit(Int.MaxValue.toLong)).cast("int"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("sh"))
    val pref = sorted.select(col("doc_id"),
      explode(expr("slice(sh, 1, CAST(size(sh) - (8 * size(sh) + 9) DIV 10 + 1 AS INT))"))
        .as("p"))
      .select(col("doc_id").as("pid"), col("p.h").as("h"))
    val cand = pref.join(hsH.select(col("doc_id").as("fid"), col("h")), "h")
      .filter(col("pid") =!= col("fid"))
      .select(least(col("pid"), col("fid")).as("ida"),
        greatest(col("pid"), col("fid")).as("idb"))
      .distinct()
    Dedup.jaccardForPairsSets(cand,
        Dedup.shingleSets(docs, "doc_id", "text", 3), "doc_id")
      .withColumn("cont", col("i").cast("double") / least(col("ca"), col("cb")))
      .filter(col("cont") >= 0.8)
      .select(col("ida"), col("idb"), col("cont"))
  }

  /** Round-14 variant 3: RANK-ENCODED arrays, candidate join on hid.
    * The dictionary ranks h by (df ASC, h ASC), so the dense id ITSELF
    * is the rare-first prefix order — the per-doc arrays drop the df
    * field entirely and ship as plain array<bigint> (the dfint
    * measurement exposed UnsafeRow's 8-byte field slots: narrowing a
    * struct field saves nothing, but dropping the field halves the
    * element, and losing the nested-struct headers saves more).
    * Prefix slice semantics are IDENTICAL to r13 (same order).
    * Candidate join keys on hid — pays the dict variant's full-side
    * re-exchange.
    */
  private def edgesRankDict(docs: DataFrame): DataFrame = {
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    val hsH = hs.filter(col("doc_id").isNotNull).repartition(col("h"))
    val dict = graft.operators.PrefixSum.globalRowNumber(
      hs.groupBy("h").agg(count(lit(1)).as("df")),
      Seq(col("df").asc, col("h").asc), "hid").drop("df")
    val enc = hsH.join(dict, "h").select(col("doc_id"), col("hid"))
    val sorted = enc.groupBy("doc_id")
      .agg(array_sort(collect_list(col("hid"))).as("sh"))
    val pref = sorted.select(col("doc_id"),
      explode(expr("slice(sh, 1, CAST(size(sh) - (8 * size(sh) + 9) DIV 10 + 1 AS INT))"))
        .as("hid"))
      .select(col("doc_id").as("pid"), col("hid"))
    val cand = pref.join(enc.select(col("doc_id").as("fid"), col("hid")), "hid")
      .filter(col("pid") =!= col("fid"))
      .select(least(col("pid"), col("fid")).as("ida"),
        greatest(col("pid"), col("fid")).as("idb"))
      .distinct()
    Dedup.jaccardForPairsSets(cand,
        Dedup.shingleSets(docs, "doc_id", "text", 3), "doc_id")
      .withColumn("cont", col("i").cast("double") / least(col("ca"), col("cb")))
      .filter(col("cont") >= 0.8)
      .select(col("ida"), col("idb"), col("cont"))
  }

  /** Round-14 variant 4: rank-encoded arrays (as [[edgesRankDict]]) but
    * the prefix rows map hid BACK to h through the dictionary before
    * the candidate join, so the full side keeps the r13 ReusedExchange
    * (zero new posting-mass write). Costs one prefix-mass hid exchange
    * + one prefix-mass h re-exchange (~20% of posting mass each);
    * saves the struct-array doc exchange.
    */
  private def edgesRankBack(docs: DataFrame): DataFrame = {
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    val hsH = hs.filter(col("doc_id").isNotNull).repartition(col("h"))
    val dict = graft.operators.PrefixSum.globalRowNumber(
      hs.groupBy("h").agg(count(lit(1)).as("df")),
      Seq(col("df").asc, col("h").asc), "hid").drop("df")
    val enc = hsH.join(dict, "h").select(col("doc_id"), col("hid"))
    val sorted = enc.groupBy("doc_id")
      .agg(array_sort(collect_list(col("hid"))).as("sh"))
    val pref = sorted.select(col("doc_id"),
      explode(expr("slice(sh, 1, CAST(size(sh) - (8 * size(sh) + 9) DIV 10 + 1 AS INT))"))
        .as("hid"))
      .select(col("doc_id").as("pid"), col("hid"))
      .join(dict, "hid") // hid -> h: prefix-mass + vocab exchange
      .select(col("pid"), col("h"))
    val cand = pref.join(hsH.select(col("doc_id").as("fid"), col("h")), "h")
      .filter(col("pid") =!= col("fid"))
      .select(least(col("pid"), col("fid")).as("ida"),
        greatest(col("pid"), col("fid")).as("idb"))
      .distinct()
    Dedup.jaccardForPairsSets(cand,
        Dedup.shingleSets(docs, "doc_id", "text", 3), "doc_id")
      .withColumn("cont", col("i").cast("double") / least(col("ca"), col("cb")))
      .filter(col("cont") >= 0.8)
      .select(col("ida"), col("idb"), col("cont"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_x100_dup20")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("GRAFT_PROF_CPUS", "16")
    val parts = sys.env.getOrElse("GRAFT_PROF_PARTITIONS", "64")
    // GRAFT_PROF_CODEC: shuffle/spill block codec under measurement —
    // the round-15 zstd receipt flips this to zstd on the r13 arm
    // (lz4 is Spark's default; the claim PLANS.md:4186 promised to
    // measure is that zstd moves shuffle BYTES where re-keying cannot)
    val codec = sys.env.getOrElse("GRAFT_PROF_CODEC", "lz4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.io.compression.codec", codec)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    println(s"[probe] io.compression.codec = $codec")
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new Metrics
    spark.sparkContext.addSparkListener(listener)

    def run(name: String, mk: => DataFrame): Unit = {
      var best = Double.MaxValue
      var bytes = (0L, 0L, 0L, 0L)
      for (_ <- 1 to passes) {
        listener.reset()
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // let the listener bus drain task-end events
        if (dt < best) {
          best = dt
          bytes = (listener.shuffleWrite.get, listener.shuffleRead.get,
            listener.memSpill.get, listener.diskSpill.get)
        }
        println(f"  pass: $name%-12s $n%12d rows  $dt%8.2f s  " +
          f"shufW=${listener.shuffleWrite.get / 1e9}%7.2f GB  " +
          f"spillMem=${listener.memSpill.get / 1e9}%7.2f GB  " +
          f"spillDisk=${listener.diskSpill.get / 1e9}%7.2f GB")
      }
      println(f"BEST $name%-12s $best%8.2f s  shufW=${bytes._1 / 1e9}%7.2f GB  " +
        f"shufR=${bytes._2 / 1e9}%7.2f GB  spillMem=${bytes._3 / 1e9}%7.2f GB  " +
        f"spillDisk=${bytes._4 / 1e9}%7.2f GB")
    }

    // one variant per JVM (arg 3): the r12 array-build shape under GC
    // pressure poisons a shared JVM for whatever runs after it
    val docs = graft.Tables(spark, dir, "documents")
    args.drop(2).headOption.getOrElse("all") match {
      case "r12" => run("r12-edges", edgesR12(docs))
      case "hyb" => run("hyb-edges", edgesHybrid(docs))
      case "dict" => run("dict-edges", edgesDict(docs))
      case "dfint" => run("dfint-edges", edgesDfInt(docs))
      case "rankdict" => run("rankdict-edges", edgesRankDict(docs))
      case "rankback" => run("rankback-edges", edgesRankBack(docs))
      case "r13" => run("r13-edges",
        graft.queries.CurationQueries13.overlapJoin.fn(spark, dir))
      case "top" => run("r13-top",
        graft.queries.CurationQueries13.overlapTop.fn(spark, dir))
      case _ =>
        run("r12-edges", edgesR12(docs))
        run("r13-edges", graft.queries.CurationQueries13.overlapJoin.fn(spark, dir))
        run("r13-top", graft.queries.CurationQueries13.overlapTop.fn(spark, dir))
    }
    spark.stop()
  }
}
