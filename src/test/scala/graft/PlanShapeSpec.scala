package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan shape gates for the round-7 time-series / sweep
  * queries — the CI form of the PLANS.md scale arguments. Each test
  * pins the property that makes the query 100-TB-safe, so a rewrite
  * that silently reintroduces a corpus-sized window input or flips a
  * broadcast build side breaks the build, not just the narrative.
  * AQE is disabled per-test: these are static-plan assertions and the
  * traversal should not stop at query-stage boundaries.
  */
class PlanShapeSpec extends SparkSpec {

  private def staticPlan(mk: => DataFrame): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Static plan with auto-broadcast ALSO disabled: the only
    * BroadcastExchanges left are the ones a `broadcast()` hint FORCES —
    * exactly the set that must never hold an unbounded frame (Spark
    * hard-fails forced broadcasts over 8 GB, so a forced corpus-derived
    * broadcast is a 100-TB query killer even when the sandbox receipts
    * look fine). AQE-chosen broadcasts are out of scope by design:
    * those are decided from exact runtime sizes and degrade gracefully.
    */
  private def forcedBroadcastPlan(mk: => DataFrame): SparkPlan = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try mk.queryExecution.executedPlan
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  /** Every FORCED broadcast operand must be provably 1-row: its subtree
    * contains a global (zero grouping keys) aggregate boundary, so its
    * cardinality is scale-invariant. Anything else — a per-text weight
    * table, a band-bounded edge stream — must be left to AQE.
    */
  private def assertForcedBroadcastsAreScalar(plan: SparkPlan, name: String): Unit = {
    val bx = plan.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b }
    for (b <- bx) {
      val scalar = b.child.collectFirst {
        case h: HashAggregateExec if h.groupingExpressions.isEmpty => h
        case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec
          if s.groupingExpressions.isEmpty => s
      }
      assert(scalar.nonEmpty,
        s"$name: forced broadcast of a non-scalar (potentially corpus-sized) frame:\n${b.child}")
    }
  }

  /** Every Window operator must sit on an AGGREGATED input (the
    * day/hour rollup) — i.e., somewhere below each window there is a
    * hash aggregate, so the one unpartitioned sort only ever sees the
    * horizon-bounded day/hour table, never the raw events corpus (the
    * q_token_cdf lesson, asserted in-plan).
    */
  private def assertWindowsSeeAggregates(plan: SparkPlan, name: String): Unit = {
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, s"$name: expected at least one Window operator")
    for (w <- windows)
      assert(w.child.collectFirst { case h: HashAggregateExec => h }.nonEmpty,
        s"$name: Window over a non-aggregated (corpus-sized) input:\n$w")
  }

  test("changepoint/autocorr/burst_hours: unpartitioned windows only see day/hour rollups") {
    assertWindowsSeeAggregates(
      staticPlan(graft.queries.EventQueries.changepoint.fn(spark, sf0001)), "q_changepoint")
    assertWindowsSeeAggregates(
      staticPlan(graft.queries.EventQueries.burstHours.fn(spark, sf0001)), "q_burst_hours")
    // q_autocorr has no window, but its lag join must also run on the
    // aggregated day table: no join input may be an un-aggregated scan
    val ac = staticPlan(graft.queries.EventQueries.autocorr.fn(spark, sf0001))
    val joins = ac.collect { case j if j.nodeName.contains("Join") => j }
    assert(joins.nonEmpty)
    for (j <- joins; c <- j.children)
      assert(c.collectFirst { case h: HashAggregateExec => h }.nonEmpty,
        s"q_autocorr: join input without an aggregate below:\n$c")
  }

  test("neardup_sweep: the 6-row threshold table is the broadcast build side") {
    val plan = staticPlan(graft.queries.DedupQueries.neardupSweep.fn(spark, sf0001))
    assert(plan.collectFirst { case c: CartesianProductExec => c }.isEmpty,
      "sweep must not plan a cartesian product")
    val bnl = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnl.nonEmpty, "theta-join against thresholds should be a broadcast NLJ")
    // the broadcast (build) side must be the Range-backed threshold table,
    // never the pair stream: its subtree reads no parquet
    for (b <- bnl) {
      val build = b.buildSide.toString match {
        case s if s.contains("Right") => b.right
        case _ => b.left
      }
      assert(build.collectFirst {
        case s if s.nodeName.contains("Scan") && s.toString.contains("parquet") => s
      }.isEmpty, s"broadcast build side reads the corpus:\n$build")
    }
  }

  test("media_batches: map-only measure — exactly one shuffle, no join") {
    val plan = staticPlan(graft.queries.MultimodalQueries.mediaBatches.fn(spark, sf0001))
    val shuffles = plan.collect { case e if e.nodeName.contains("Exchange") => e }
    assert(shuffles.length == 1,
      s"expected one exchange (final agg), got ${shuffles.length}")
    assert(plan.collectFirst { case j if j.nodeName.contains("Join") => j }.isEmpty,
      "media batch planning must not join")
  }

  test("q6_forecast: every predicate reaches the parquet scan") {
    val plan = staticPlan(
      graft.queries.RelationalQueries3.q6Forecast.fn(spark, sf0001))
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a parquet scan")
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"predicate on $c not pushed: $pushed")
    // and the projection is pruned to the four referenced columns
    assert(scans.head.requiredSchema.fieldNames.toSet ==
      Set("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"),
      s"scan reads ${scans.head.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q10_returned: dims broadcast at sandbox scale; customer never FORCED") {
    val plan = staticPlan(
      graft.queries.RelationalQueries3.q10Returned.fn(spark, sf0001))
    val bhj = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b }
    // at sf0.001 both dims are KB-sized: auto-broadcast (customer) plus
    // the forced nation hint still plan both joins as BHJ
    assert(bhj.size >= 2, s"customer and nation should broadcast at this SF, got ${bhj.size}")
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    // fact-side join on orderkey + final agg on custkey: at most these
    assert(shuffles.size <= 3, s"unexpected shuffles: ${shuffles.size}")
    // round 12: customer is SF-scaled (150k rows/SF) — its broadcast
    // must be AQE/threshold-chosen, never hint-FORCED (forced
    // broadcasts hard-fail at 8 GB). With auto-broadcast off, no
    // remaining BroadcastExchange may scan the customer table.
    val forced = forcedBroadcastPlan(
      graft.queries.RelationalQueries3.q10Returned.fn(spark, sf0001))
    for (b <- forced.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b })
      assert(b.child.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.toString.contains("customer") => s }.isEmpty,
        s"customer under a FORCED BroadcastExchange:\n${b.child}")
  }

  test("vocab_coverage/token_cdf: the corpus is tokenized exactly once") {
    // vocab_coverage: numerator (top-20) and denominator (Σcnt) both hang
    // off ONE groupBy(tok) — one Generate (explode) in the whole plan,
    // and the second consumer reads the shuffle through ReusedExchange
    val vc = staticPlan(graft.queries.CurationQueries6.vocabCoverage.fn(spark, sf0001))
    val gens = vc.collect { case g if g.nodeName.contains("Generate") => g }
    assert(gens.length == 1, s"expected one explode over the corpus, got ${gens.length}")
    assert(vc.collectFirst { case r if r.nodeName.contains("ReusedExchange") => r }.nonEmpty,
      "denominator branch must reuse the token-count exchange")
    // token_cdf: both branches read the materialized 16-byte (doc_id, n)
    // frame — the text corpus does not appear in the final plan at all
    val tc = staticPlan(graft.queries.CurationQueries3.tokenCdf.fn(spark, sf0001))
    val scans = tc.collect {
      case s if s.nodeName.contains("Scan") && s.toString.contains("parquet") => s }
    assert(scans.isEmpty,
      "token_cdf must read the checkpointed length frame, not re-scan text")
  }

  test("ngram pair backbone: one corpus exchange, reused by every consumer") {
    // round-10 shape: ONE LINEAR CHAIN. The df-capped groupBy(h)
    // (CappedCollectAggregator) is the only aggregate the shingle
    // corpus feeds; per-doc cardinality is a count-over-window on the
    // posting table and rides the pair keys as packed low bits, so the
    // pair stream crosses exactly one exchange and there is NO join
    // anywhere in the backbone (the round-9 card joins re-shuffled the
    // Θ(pairs) stream twice; the interim card-branch+join form planned
    // a second corpus scan). Contract: corpus scanned once, zero
    // joins, and a Window node present for the cardinality.
    val cj = staticPlan(graft.queries.CurationQueries.containment.fn(spark, sf0001))
    val scans = cj.collect {
      case s if s.nodeName.contains("Scan") && s.toString.contains("documents") => s }
    assert(scans.length == 1,
      s"pair backbone must scan the corpus once, got ${scans.length}")
    val joins = cj.collect { case j if j.nodeName.contains("Join") => j }
    assert(joins.isEmpty,
      s"pair backbone must be join-free (cardinality rides the pair key), got:\n$joins")
    assert(cj.collectFirst { case w if w.nodeName.contains("Window") => w }.nonEmpty,
      "per-doc cardinality must come from the posting-table window")
  }

  test("bpe_encode: vocab join broadcasts, one doc-keyed exchange, no SMJ, no cache") {
    // round-10 shape: after training (driver loop), the encode tail is
    // scan → nested fold kernels → posexplode → BroadcastHashJoin
    // against the vocab → partial-agg by doc_id → ONE shuffle. A
    // regression to SMJ sorts the exploded corpus by token string; a
    // second ShuffleExchange means the join started scattering doc_id
    // partials corpus-wide; an InMemoryTableScan means the measured
    // 5x-per-decade columnar cache fill crept back (PLANS.md, the BPE
    // cache whale). The vocab rank's at-scale shape is pinned by
    // forcing the PrefixSum scan dispatch (round-14: the size-estimate
    // fast path legitimately keeps a lazy rank window at sandbox SFs).
    spark.conf.set(graft.operators.PrefixSum.ThresholdConf, "-1")
    val plan = try staticPlan(graft.queries.TextStatsQueries.bpeEncode.fn(spark, sf0001))
      finally spark.conf.unset(graft.operators.PrefixSum.ThresholdConf)
    val smj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smj.isEmpty, "token->id join regressed to a corpus-sorted SMJ")
    // round 11: the vocab join is the ONLY join — the doc char count
    // rides the encode projection and folds out of the aggregate as
    // max(nc), so a second join of any kind means the Θ(docs)
    // back-join crept back in (it leaned on auto-broadcast firing)
    val joins = plan.collect { case j if j.nodeName.contains("Join") => j }
    assert(joins.size == 1, s"encode tail must have exactly the vocab join, got:\n$joins")
    val bhj = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b }
    assert(bhj.size == 1, s"vocab join must broadcast, got ${bhj.size}")
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(shuffles.size <= 1,
      s"encode tail must shuffle only the doc-keyed aggregate, got ${shuffles.size}")
    val cached = plan.collect { case c if c.nodeName.contains("InMemory") => c }
    assert(cached.isEmpty, "corpus-sized frame pinned in the block manager")
  }

  test("seq_pack_bpe: no shard window, RDD cum leaf, bounded exchanges") {
    // round-13 shape: the per-lang running total left the plan entirely
    // (PrefixSum.byShard pre-executes it into a LogicalRDD leaf — the
    // lang-partitioned window was a #languages parallelism ceiling);
    // the encode tail is scan → fold kernels → cum join on doc_id →
    // posexplode with map-side global positions → BroadcastHashJoin
    // against the vocab → (lang, bin) distinct-expanded aggregate.
    // Exchanges: ≤2 (the countDistinct two-phase agg, both doc-scale
    // narrow frames; at sf0.001 the cum join broadcasts — at scale it
    // may shuffle on doc_id, which is fine and well-distributed). A
    // WindowExec reappearing means the shard window crept back; an SMJ
    // ordering by TOKEN STRING means the vocab join lost its broadcast.
    // The at-scale shape is pinned by FORCING the scan dispatch (the
    // size-estimate fast path legitimately keeps the lazy lang window
    // at sandbox SFs — PrefixSum.SmallInputBytes scaladoc).
    spark.conf.set(graft.operators.PrefixSum.ThresholdConf, "-1")
    val plan = try staticPlan(graft.queries.TextStatsQueries2.seqPackBpe.fn(spark, sf0001))
      finally spark.conf.unset(graft.operators.PrefixSum.ThresholdConf)
    assert(plan.collectFirst { case w if w.nodeName.contains("Window") => w }.isEmpty,
      "per-lang shard window crept back (the #languages parallelism ceiling)")
    assert(plan.collectFirst {
      case r if r.nodeName.contains("ExistingRDD") || r.nodeName.contains("RDDScan") => r
    }.nonEmpty, "PrefixSum cum frame must enter as an RDD leaf")
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(shuffles.size <= 2,
      s"packer tail must shuffle at most twice (distinct-expanded agg), got ${shuffles.size}")
    val bhj = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, "vocab join must broadcast")
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }.isEmpty,
      "a join regressed to SMJ at sf0.001 (vocab or cum join lost its broadcast)")
  }

  test("relational de-hints: no SF-scaled table under a forced BroadcastExchange") {
    // round-12 ledger rule, gated for the five relational queries whose
    // fact-scaled dims (customer 150k rows/SF, part 200k/SF, supplier
    // 10k/SF) and the bloom audit's selected-orderkey set were
    // hint-forced before: with auto-broadcast off, any remaining
    // BroadcastExchange must scan only the constant-size dims
    // (nation/region) — never an SF-scaled table.
    val fns = Seq(
      "q3_top_orders" -> graft.queries.RelationalQueries.q3TopOrders,
      "q5_region_revenue" -> graft.queries.RelationalQueries.q5RegionRevenue,
      "q14_promo" -> graft.queries.RelationalQueries3.q14Promo,
      "q_supplier_nation" -> graft.queries.RelationalQueries3.qSupplierNation,
      "q_bloom_prejoin" -> graft.queries.CurationQueries10.bloomPrejoin)
    // the criterion is CARDINALITY, not which table is scanned:
    // q_bloom_prejoin's bucket set reads orders but is value-bounded
    // (≤65536 distinct pmod buckets — legitimately broadcast), while a
    // frame still carrying a ROW-IDENTITY key (custkey/partkey/suppkey/
    // orderkey) has one row per fact row and must never be hint-forced
    val rowKeys = Seq("c_custkey", "p_partkey", "s_suppkey", "o_orderkey", "l_orderkey")
    for ((name, q) <- fns) {
      val plan = forcedBroadcastPlan(q.fn(spark, sf0001))
      for (b <- plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b })
        for (k <- rowKeys)
          assert(!b.child.output.exists(_.name == k),
            s"$name: SF-scaled frame (carries $k) under a FORCED BroadcastExchange:\n${b.child}")
    }
  }

  test("weighted-rep family: no corpus-derived frame under a forced BroadcastExchange") {
    // round-12 gate (the round-11 verdict's `weak`): the four
    // weighted-representative contractions join their rep-edge stream
    // against a Θ(distinct-texts) weight table. That join must NOT be
    // hint-forced to broadcast — on a low-duplication corpus distinct
    // texts ≈ docs, and Spark hard-fails forced broadcasts at 8 GB, so
    // the hint turns a graceful shuffle into a 100-TB crash. With the
    // hints dropped, the only broadcasts a hint still forces in these
    // plans are 1-row global aggregates (totals / scalar stats).
    val fns = Seq(
      "q_source_dup_matrix" -> graft.queries.CurationQueries14.sourceDupMatrix,
      "q_source_overlap" -> graft.queries.DedupQueries.sourceOverlap,
      "q_split_leakage" -> graft.queries.DedupQueries.splitLeakage,
      "q_triangle_count" -> graft.queries.CurationQueries11.triangleCount)
    for ((name, q) <- fns)
      assertForcedBroadcastsAreScalar(forcedBroadcastPlan(q.fn(spark, sf0001)), name)
  }

  test("overlap backbone: shared h-exchange reused by the candidate join") {
    // round-13 shuffle cut (verdict item 5): the containment family's
    // prefix-filter backbone must pay TWO posting-mass exchanges, not
    // three — the one explicit h-repartition feeds both the df-window
    // and (through ReuseExchange) the candidate join's full side. A
    // missing ReusedExchange means the join re-shuffles the posting
    // table (the isnotnull-constraint canonicalization mismatch, see
    // containmentEdges scaladoc); >3 shuffles means a posting-mass
    // exchange crept back. (The collect_list array prefix build is the
    // MEASURED keeper over a rank-window form — OverlapProbe receipts
    // in PLANS.md round 13 — so no array assertion here.)
    for ((name, q) <- Seq(
      "q_overlap_join" -> graft.queries.CurationQueries13.overlapJoin)) {
      val plan = staticPlan(q.fn(spark, sf0001))
      assert(plan.collectFirst {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r }.nonEmpty,
        s"$name: candidate join does not reuse the h-keyed posting exchange:\n$plan")
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(shuffles.size <= 3,
        s"$name: expected ≤3 shuffles (h-posting, doc-prefix, pair-distinct), got ${shuffles.size}")
    }
  }

  test("registry-wide: every hint-forced broadcast operand is provably bounded") {
    // Round-13 gate (the round-12 verdict's top item): the
    // corpus-scale-broadcast class recurred twice (r10 pair stream, r11
    // weight tables) and was fixed both times by hand-audit — this test
    // makes the standing rule self-enforcing over the WHOLE registry.
    // Every plan is built with AQE off and autoBroadcastJoinThreshold
    // -1, so the only BroadcastExchanges left are hint-FORCED (Spark
    // hard-fails those at 8 GB — a forced corpus-scaled operand is a
    // 100-TB query killer even when sandbox receipts look fine). Each
    // forced operand must be plan-provably bounded (1-row aggregate,
    // LIMIT-k, driver-literal spine, constant nation/region dim) or
    // carry an entry in BroadcastAudit.Allowed — the executable form of
    // the PLANS.md hint ledger, one documented cap per (query, operand)
    // pair. Reference analog: the only operand the reference ever
    // "broadcasts" is the single query vector (vector-db.c:165-168).
    import graft.tools.BroadcastAudit
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // pin the AT-SCALE shape of every PrefixSum call site: the
    // size-estimate fast path legitimately keeps a lazy (possibly
    // unpartitioned) window at sandbox SFs — the gate must judge the
    // shape the dispatch produces at corpus scale (the seq_pack_bpe
    // test's precedent, now registry-wide)
    spark.conf.set(graft.operators.PrefixSum.ThresholdConf, "-1")
    // the four offense classes (forced broadcast / cartesian /
    // buffering aggregate / unpartitioned window) live in ONE shared
    // checker — BroadcastAudit.planOffenders — so the adversarial
    // negative test below exercises exactly the code path this sweep
    // enforces (round-14: the gates' false-negative risk was untested)
    val offenders = Seq.newBuilder[String]
    try {
      for (q <- SparkEntry.registry)
        offenders ++= BroadcastAudit.planOffenders(q.name,
          q.fn(spark, sf0001).queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.unset(graft.operators.PrefixSum.ThresholdConf)
    }
    val bad = offenders.result()
    assert(bad.isEmpty,
      s"hint-forced broadcast of unproven-bounded operands in ${bad.size} plan(s):\n" +
        bad.mkString("\n---\n"))
    // and the allow-list carries no dead entries: every (query, sig)
    // pair must name a registered query (a renamed query must move its
    // ledger row, not orphan it)
    val names = SparkEntry.registry.map(_.name).toSet
    val dead = BroadcastAudit.Allowed.keys.filterNot { case (n, _) => names.contains(n) }
    assert(dead.isEmpty, s"allow-list entries for unregistered queries: $dead")
    val deadW = BroadcastAudit.WindowAllowed.keys.filterNot { case (n, _) => names.contains(n) }
    assert(deadW.isEmpty, s"window allow-list entries for unregistered queries: $deadW")
    val deadA = BroadcastAudit.AggAllowed.keys.filterNot { case (n, _) => names.contains(n) }
    assert(deadA.isEmpty, s"aggregate allow-list entries for unregistered queries: $deadA")
  }

  test("gate negative paths: deliberately-bad plans are rejected by name") {
    // The three registry sweeps are only proven on plans that PASS —
    // this is the false-negative check (round-13 verdict item 6): one
    // deliberately-bad plan per offense class, asserted to be REJECTED
    // with the right offense name by the same BroadcastAudit
    // .planOffenders the registry sweep runs. None of these are
    // registered queries, so no allow-list entry can excuse them.
    import org.apache.spark.sql.functions.{broadcast, col, collect_list, row_number}
    import graft.tools.BroadcastAudit
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables(spark, sf0001, "documents")
      def offenders(df: DataFrame) =
        BroadcastAudit.planOffenders("adversarial", df.queryExecution.executedPlan)
      // 1. corpus-scaled FORCED broadcast: the class that recurred in
      //    r10 (pair stream) and r11 (weight tables)
      val badBroadcast = docs.join(
        broadcast(docs.select(col("doc_id"), col("n_chars"))), "doc_id")
      assert(offenders(badBroadcast).exists(_.contains("FORCED BROADCAST")),
        "gate must reject a hint-forced broadcast of a corpus-scaled operand")
      // 2. UNPARTITIONED growing window: the whole corpus through one
      //    window task (the q_token_cdf lesson)
      val badWindow = docs.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
      assert(offenders(badWindow).exists(_.contains("UNPARTITIONED WINDOW")),
        "gate must reject an unpartitioned window over corpus-scaled input")
      // 3. uncapped collect over a few-valued key: one reducer buffers
      //    corpus/#langs rows (the q_winnow posting-list OOM class)
      val badCollect = docs.groupBy("lang").agg(collect_list(col("text")).as("texts"))
      assert(offenders(badCollect).exists(_.contains("UNBOUNDED-BUFFER AGG")),
        "gate must reject an uncapped collect_list over corpus-fed input")
      // 4. cartesian of two corpus-scaled sides
      val badCartesian = docs.select(col("doc_id"))
        .crossJoin(docs.select(col("doc_id").as("d2")))
      assert(offenders(badCartesian).exists(_.contains("CARTESIAN")),
        "gate must reject a corpus×corpus cartesian product")
      // and a GOOD plan of each shape passes: scalar broadcast,
      // enum-rollup window input, per-entity collect
      val goodScalar = docs.crossJoin(
        broadcast(docs.agg(org.apache.spark.sql.functions.count(col("doc_id")).as("n"))))
      assert(offenders(goodScalar).isEmpty,
        "gate must admit a 1-row scalar broadcast / cartesian side")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("bigram_ppl: LM joins are hash-keyed, never cartesian") {
    val plan = staticPlan(graft.queries.TextStatsQueries.bigramPpl.fn(spark, sf0001))
    assert(plan.collectFirst { case c: CartesianProductExec => c }.isEmpty,
      "perplexity scoring must not plan a cartesian product")
    // the only nested-loop broadcast allowed is the 1-row vocabulary scalar
    for (b <- plan.collect { case b: BroadcastNestedLoopJoinExec => b }) {
      val build = if (b.buildSide.toString.contains("Right")) b.right else b.left
      assert(build.collectFirst { case h: HashAggregateExec => h }.nonEmpty,
        s"nested-loop build side is not the aggregated vocab scalar:\n$build")
    }
  }
}
