package graft

/** Re-sharding determinism: the engine's claim that results are
  * independent of physical partitioning — the property that makes runs
  * reproducible across cluster sizes. Each query runs under two very
  * different scan/shuffle layouts (tiny maxPartitionBytes forces many
  * input splits; different shuffle partition counts change reduce-side
  * grouping and accumulation order) and must produce identical rows.
  * This is why float accumulations in these queries are quantized or
  * decimal-cast internally: a plain double sum would already fail here.
  */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "q_stratified_k",  // hash-ordered sampling: pick must not depend on sharding
    "q_sample_split",  // content-hash split
    "q_random_proj",   // quantized-BIGINT fold
    "q_centroids",     // 2^52-quantized order-independent sums
    "q_minhash_sig",   // min() over permuted hashes
    "q_bigram_lm",     // per-term 2^40-quantized ln before the sum
    "q_zipf_fit",      // OLS over 2^20-quantized lns, DECIMAL-cast product sums
    "q_embed_dim_stats", // mean/var from 2^52 + 2^45 integer grids
    "q_temperature_mix", // sqrt (correctly-rounded) + integer normalization
    "q_pipeline_funnel", // five chained stages, counts must not depend on layout
    // round-7 rewrites: distributed rank/window algebra must not depend
    // on physical layout either
    "q_token_cdf",       // histogram-derived global ranks -> exact ntile
    "q_cooccur_pmi",     // map-side windowed pairs + quantized ln
    "q_semdedup",        // two-level quantized-L2 argmin, (d2, id) ties
    "q_shard_assign",    // salted id-hash sharding
    // round-7 batch: normalized-integer dot products and histogram
    // thresholds must survive re-sharding too
    "q_tfidf_neardup",      // L2-normalized 2^10-grid postings dot
    "q_quality_calibration", // histogram nearest-rank thresholds
    "q_cluster_separation",  // 2^45-grid spreads + pair distances
    "q_dim_corr",            // GramAggregator integer moment buffers
    "q_semdedup_prune",      // apply step over the semdedup pair stream
    "q_autocorr",            // integer moment sums on the day axis
    "q_changepoint",         // pure-BIGINT CUSUM argmax, day tie-break
    "q_interarrival",        // integer second gaps, minute buckets
    "q_embed_drift",         // 2^52 centroid sums, 2^45 diff terms
    "q_psi",                 // per-bucket ln terms on the 2^40 grid
    "q_event_itemsets",      // session sets + 2^20 lift grid
    "q_bigram_ppl",          // heldout ln terms on the 2^40 grid
    "q_burst_hours",         // integral trailing-window ratios
    "q_neardup_sweep",       // integer-percent threshold buckets
    "q_pagerank",            // pure-integral damping arithmetic
    "q_weighted_sample",     // hash-grid keys, one quantized ln
    // round-7 batch 8: layout planning and rank blocking must be
    // invariant to the very sharding they reason about
    "q_zorder_layout",       // Morton bit algebra + zone-map envelopes
    "q_snm_blocking",        // zipWithIndex global ranks, banded join
    "q_repeated_spans",      // island merge over per-doc position windows
    // round-7 batch 9: fixed-literal DCG weights; pair-stream classes
    "q_ann_ndcg",            // 2^40 weight table, integral ndcg/rr ratios
    "q_split_leakage",       // lsh pair stream x salted-hash splits
    "q_bpe_learn",           // count-DESC/lex argmax + sequential fold
    // round-9: the hour-bucketed interval join (each pair matches in
    // exactly one bucket) and the kernel-emitted collocation pairs
    "q_interval_join",       // bucket explode + residual range filter
    "q_cooccur_pmi",         // windowed-pairs kernel over sorted positions
    // round-9 backbone fusion: the capped collector buffers ids in
    // ARRIVAL order — kept groups (n <= cap) carry their complete set
    // and the pair kernel sorts, but a truncation bug would surface
    // here as shard-dependent pair sets
    "q_containment")         // capped-collect exchange + sorted pair kernel

  private def runAll(maxPartBytes: String, shuffleParts: String): Map[String, Seq[String]] = {
    val prevBytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartBytes)
    spark.conf.set("spark.sql.shuffle.partitions", shuffleParts)
    try names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf0001).toJSON.collect().toSeq.sorted
    }.toMap
    finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevBytes)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  test("results are bit-identical under different scan splits and shuffle widths") {
    val a = runAll(maxPartBytes = "16384", shuffleParts = "3")
    val b = runAll(maxPartBytes = "134217728", shuffleParts = "17")
    for (n <- names) {
      assert(a(n).nonEmpty, s"$n returned no rows")
      assert(a(n) == b(n), s"$n differs across physical layouts")
    }
  }
}
