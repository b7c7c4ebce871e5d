package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.HashExpressions.positionalShinglesFast
import graft.functions.TextFunctions.tokens

/** Thirty-second batch: coverage-driven selection and exact repeated
  * substrings — two operators the curation surface still lacked.
  *
  * `q_kcenter_coreset` is greedy farthest-first traversal (Gonzalez
  * 1985), the coreset-selection primitive behind diversity-driven data
  * pruning (Sener & Savarese 2018): unlike `q_mmr_select`, whose greedy
  * runs over a 16-row retrieval shortlist, k-center's argmax is over
  * the WHOLE corpus each round — so the distributed part is the whole
  * point, and the driver holds only the k selected centers.
  *
  * `q_longest_repeat` answers the exact-substring question the
  * suffix-array dedup literature (Lee et al. 2022) builds an index
  * for — the corpus's longest token span occurring at least twice —
  * WITHOUT a suffix array: binary search on span width, each probe one
  * corpus pass of the rolling positional-shingle kernel, candidates
  * text-verified so hash collisions can never distort the answer.
  */
object CurationQueries32 {

  private val K = 8 // k-center selections
  private val Q20 = 1048576.0 // quantization grid shared with q_mmr_select

  /** K-CENTER CORESET — greedy farthest-first traversal: seed with the
    * lowest vec_id, then k−1 times pick the point maximizing its
    * distance to the nearest already-selected center (squared L2 on the
    * Q20 integer grid — exact in both engines, the `q_mmr_select`
    * discipline; ties to lower vec_id). The per-step radius is the
    * classic 2-approximation certificate: after k picks every point
    * sits within radius_q of a center. This is the data-pruning
    * selection that maximizes COVERAGE of embedding space (where MMR
    * balances relevance, and SemDeDup removes redundancy).
    *
    * SCALE: each round is a map-only distance evaluation against ≤k
    * broadcast centers (zip_with/aggregate integer algebra inside
    * whole-stage codegen) feeding a TakeOrderedAndProject(1) — no
    * shuffle, no materialized distance matrix; driver state is k rows.
    * K scans of the corpus total. At 100 TB the same loop holds
    * (centers stay a driver-side array); when K grows past tens one
    * switches to the running-min-dist variant (persist one column,
    * compare against the single new center per round — O(N·K) work in
    * amortized one pass) or composes per-partition candidates first.
    */
  val kcenterCoreset: QueryDef = QueryDef.sql(
    "q_kcenter_coreset", {
      val mind = "list_min(list_transform(vecs, v -> CAST(list_sum(" +
        "list_transform(list_zip(i.e, v), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)))"
      def pick(sel: String) =
        s"""(SELECT $sel FROM iv i WHERE NOT list_contains(ids, i.vec_id)
           |ORDER BY $mind DESC, i.vec_id LIMIT 1)""".stripMargin
      s"""WITH RECURSIVE
         |iv AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(x * $Q20) AS BIGINT)) AS e
         |       FROM embeddings),
         |sel AS (
         |  SELECT 1 AS step,
         |         (SELECT vec_id FROM iv ORDER BY vec_id LIMIT 1) AS picked,
         |         CAST(0 AS BIGINT) AS radius_q,
         |         [(SELECT e FROM iv ORDER BY vec_id LIMIT 1)] AS vecs,
         |         [(SELECT vec_id FROM iv ORDER BY vec_id LIMIT 1)] AS ids
         |  UNION ALL
         |  SELECT step + 1, ${pick("i.vec_id")}, ${pick(mind)},
         |         list_append(vecs, ${pick("i.e")}),
         |         list_append(ids, ${pick("i.vec_id")})
         |  FROM sel WHERE step < $K)
         |SELECT CAST(step AS BIGINT) AS step, CAST(picked AS BIGINT) AS picked, radius_q
         |FROM sel""".stripMargin
    }) { (spark, dir) => kcenterRun(spark, dir, K, incremental = false) }

  /** Shared greedy farthest-first loop behind both k-center queries.
    * `incremental = false` is the literal Gonzalez form: each round
    * recomputes min-dist against ALL ≤k broadcast centers (O(k·d) per
    * point per round — fine at small K, K full-width scans total).
    * `incremental = true` is the running-min-dist variant the round-9
    * design note documented for large K: the frame carries one
    * persisted `mind` column and each round folds in ONLY the newest
    * center (`mind := least(mind, dist²(e, c_new))`) before the
    * argmax — O(d) per point per round, so per-round cost is FLAT in
    * K instead of linear. Identical picks by construction: after
    * round r both forms hold mind = min over centers 1..r of dist²,
    * the same integer, and ties break on the same vec_id order — a
    * property test pins the trajectories equal, and both queries
    * share one oracle. Cache discipline: at most two generations of
    * the (vec_id, e, mind) frame live (MEMORY_AND_DISK_SER, the BPE
    * sliding window).
    *
    * LINEAGE TRUNCATION (round 11 — found by the K∈{256,1024} probe
    * the verdict asked for): persist truncates EXECUTION but not the
    * LOGICAL plan — each round's frame nests every prior fold, so
    * Catalyst re-analyzes an O(step)-deep tree per round (per-round
    * cost measured 0.127 s at K=32 → 0.249 s at K=256 on sf0.1, and
    * the K=256 run CRASHED outright on a default JVM stack — analyzer
    * recursion over the 255-deep tree). Every [[CkptEvery]] rounds the
    * generation is `localCheckpoint`ed instead: flat LogicalRDD plan,
    * bounded analyzer depth, per-round cost flat in K (re-probed
    * receipts in PLANS.md; ScaleSlopeSpec gates the flatness ratio).
    */
  private val CkptEvery = 32
  private[graft] def kcenterRun(spark: SparkSession, dir: String, k: Int,
      incremental: Boolean): DataFrame = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    // every greedy round re-reads the quantized frame (K argmax jobs,
    // plus each literal-form round recomputes it under the fold) — one
    // scan+quantize pass, materialized (round 16; Θ(N·d) longs;
    // durability: round-12 ledger class)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * lit(Q20)).cast("long")).as("e"))
      .localCheckpoint()
    val seed = emb.orderBy("vec_id").limit(1).collect()(0)
    var centers = Vector((seed.getLong(0), seed.getSeq[Long](1).toArray))
    var out = Vector((1L, seed.getLong(0), 0L))
    def dist2To(c: Array[Long]) =
      aggregate(zip_with(col("e"), typedLit(c.toSeq),
        (x, y) => (x - y) * (x - y)), lit(0L), (a, b) => a + b)
    var frame = emb.withColumn("mind", lit(Long.MaxValue))
    var prevGen: Option[DataFrame] = None
    var sinceCkpt = 0
    for (step <- 2 to k) {
      val newest = centers.last._2
      if (incremental) {
        val folded = frame.withColumn("mind", least(col("mind"), dist2To(newest)))
        sinceCkpt += 1
        if (sinceCkpt >= CkptEvery) {
          // truncate the logical lineage: eager localCheckpoint yields a
          // flat LogicalRDD, so analyzer work stays bounded at any K;
          // the checkpoint job replaces (not adds to) the argmax's
          // materialization work, and stale checkpoint blocks are
          // reclaimed by the ContextCleaner once unreferenced
          frame = folded.localCheckpoint()
          sinceCkpt = 0
          prevGen.foreach(_.unpersist(false))
          prevGen = None
        } else {
          frame = folded.persist(StorageLevel.MEMORY_AND_DISK_SER)
        }
      } else {
        // recompute against the full center set (the literal form)
        val mind = centers.map { case (_, c) => dist2To(c) }.reduce(least(_, _))
        frame = emb.withColumn("mind", mind)
      }
      val far = frame.filter(!col("vec_id").isInCollection(centers.map(_._1)))
        .select(col("vec_id"), col("e"), col("mind"))
        .orderBy(col("mind").desc, col("vec_id")).limit(1)
        .collect()(0)
      // the argmax above MATERIALIZED this generation into cache — only
      // now is the previous one safe to drop (unpersisting before the
      // action would force every round to recompute the whole fold
      // chain from the scan: O(k) per round, the exact cost this
      // variant exists to avoid)
      if (incremental) {
        prevGen.foreach(_.unpersist(false))
        prevGen = Some(frame)
      }
      centers = centers :+ ((far.getLong(0), far.getSeq[Long](1).toArray))
      out = out :+ ((step.toLong, far.getLong(0), far.getLong(2)))
    }
    prevGen.foreach(_.unpersist(false))
    out.toDF("step", "picked", "radius_q")
  }

  /** RUNNING-MIN-DIST K-CENTER — the large-K twin of
    * [[kcenterCoreset]] (same picks, same oracle; see [[kcenterRun]]):
    * per-round work drops from O(k·d) to O(d) per point, which is the
    * difference between K scans costing Θ(K²·d·N) total and Θ(K·d·N)
    * — at K in the hundreds (coreset sizes for real pruning runs) the
    * literal form pays a quadratic the incremental form does not.
    */
  val kcenterInc: QueryDef = QueryDef.sql(
    "q_kcenter_inc", kcenterCoreset.oracle.get) { (spark, dir) =>
    kcenterRun(spark, dir, K, incremental = true)
  }

  /** ARTIFACT-BACKED coreset (round 12) — the k-center member of the
    * artifact-twin family (`q_quality_score_artifact` /
    * `q_ivf_probe_artifact` / `q_pq_codes_artifact` /
    * `q_bpe_encode_artifact`): run the selection, PERSIST it
    * ([[graft.pipelines.ModelArtifacts.saveCoreset]]), and emit the
    * LOADED copy under [[kcenterCoreset]]'s oracle — for a coreset the
    * artifact IS the served output (center ids + radius certificates;
    * downstream pruning semi-joins the ids), so the round-trip is the
    * whole serving path and the driver's hash gate proves it exact.
    */
  val kcenterArtifact: QueryDef = QueryDef.sql(
    "q_kcenter_artifact", kcenterCoreset.oracle.get) { (spark, dir) =>
    val path = s"/tmp/graft_artifacts/${spark.sparkContext.applicationId}/" +
      s"${dir.replaceAll("[^A-Za-z0-9.]", "_")}/kcenter_coreset.parquet"
    graft.pipelines.ModelArtifacts.saveCoreset(spark,
      kcenterRun(spark, dir, K, incremental = true), path)
    graft.pipelines.ModelArtifacts.loadCoreset(spark, path)
  }

  /** LONGEST REPEATED SPAN — the exact answer to "what is the longest
    * token sequence this corpus contains twice?" (overlaps and
    * same-document repeats count, spans never cross documents): binary
    * search on the span width S with the monotone predicate "some
    * width-S span occurs ≥2 times". Each probe is one corpus pass of
    * the rolling prefix-hash kernel (every width-S window hash in
    * O(chars) per doc), a fingerprint-keyed count, and a TEXT
    * verification of the surviving candidates — fingerprints prune,
    * never decide, so the 2^30 hash space cannot produce a phantom
    * repeat (and verified truth keeps the predicate monotone, which
    * collision noise alone would break). The winner is the
    * lexicographically least maximal span with its exact occurrence
    * count. Where `q_repeated_spans` mines per-document islands of
    * duplicated fixed-width windows, this is the corpus-level suffix-
    * array question answered in O(log L) passes — at 100 TB, log of
    * the max DOCUMENT length (~dozens of rounds-free probes), each
    * linear, map-side, and shuffle-bounded by the candidate set; a
    * distributed suffix array would pay log N global sort rounds for
    * the same answer.
    *
    * Oracle: the real suffix-sort construction — every token suffix,
    * char-sorted (the space separator sorts below all token chars, so
    * equal-token-prefix groups stay contiguous), adjacent-pair token
    * LCP via the first-mismatch position of the zipped lists, max LCP
    * = the span width, then the least witness and its prefix count.
    */
  val longestRepeat: QueryDef = QueryDef.sql(
    "q_longest_repeat",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |suf AS (SELECT doc_id, p, toks[p:len(toks)] AS st
       |        FROM tk, unnest(range(1, len(toks) + 1)) t(p)),
       |srt AS (SELECT st, lead(st) OVER (ORDER BY array_to_string(st, ' ')) AS nx FROM suf),
       |l AS (SELECT st,
       |             CASE WHEN nx IS NULL THEN 0
       |                  ELSE coalesce(list_position(list_transform(list_zip(st, nx),
       |                         p -> coalesce(p[1] = p[2], false)), false) - 1,
       |                       least(len(st), len(nx))) END AS lcp
       |      FROM srt),
       |best AS (SELECT max(lcp) AS len FROM l),
       |win AS (SELECT min(array_to_string(st[1:len], ' ')) AS span
       |        FROM l, best WHERE lcp = len AND len >= 1),
       |occ AS (SELECT count(*) AS n FROM suf, best, win
       |        WHERE len(st) >= len AND array_to_string(st[1:len], ' ') = span)
       |SELECT CAST(best.len AS BIGINT) AS lrs_len, CAST(occ.n AS BIGINT) AS n_occ, win.span
       |FROM best, win, occ WHERE best.len >= 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // one materialization feeds all ~log L probes (each probe reads tk
    // twice: window pass + verify re-slice) — the q_bpe_learn pattern;
    // without it every probe re-scans parquet and re-tokenizes
    val tk = Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .localCheckpoint()

    // width-S spans occurring ≥2 times, verified on text: fingerprint
    // groups prune to candidates, a re-slice groups the actual spans
    def verifiedSpans(s: Int): DataFrame = {
      val w = tk.filter(size(col("toks")) >= s)
        .select(col("doc_id"),
          explode(positionalShinglesFast(col("toks"), s)).as("pf"))
        .select(col("doc_id"), col("pf.p").as("p"), col("pf.fp").as("fp"))
      val cand = w.groupBy("fp").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      w.join(cand, "fp")
        .join(tk, "doc_id")
        .select(array_join(slice(col("toks"), col("p"), lit(s)), " ").as("span"))
        .groupBy("span").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
    }
    // BATCHED PROBES (round 17, guide §1/§2: fewer driver round-trips,
    // no duplicate kernel runs): each bisection step evaluates up to
    // `ProbesPerPass` candidate widths in ONE pass. The per-width
    // window frames are unioned and materialized once, so the rolling
    // shingle kernel runs ONCE per width per pass — the lazy
    // per-probe shape computed it twice (once under the candidate
    // aggregate, once again as the join-back side; no exchange reuse
    // fires across those differently-shaped subtrees) and paid a
    // scheduler round-trip per width. The interval shrinks ~4x per
    // pass instead of 2x. Monotonicity of the verified predicate
    // makes the multi-point update sound: lo := max(repeating
    // probes), hi := min(non-repeating) - 1. Durability of the
    // per-pass checkpoint: round-12 ledger class (a lost executor
    // restarts the query).
    // Width 7: the exchange/join count of a pass is INDEPENDENT of the
    // batch width (one unioned frame), so widening the batch trades
    // map-side kernel work (cheap, embarrassingly parallel) for whole
    // passes: ~log8(L) passes instead of log2(L) probes, with total
    // kernel work ~unchanged (7 widths x log8 ~= 2 x log2 evaluations).
    val ProbesPerPass = 7
    def repeatedIn(ss: Seq[Int]): Set[Int] = {
      val wAll = ss.map { s =>
        tk.filter(size(col("toks")) >= s)
          .select(lit(s).as("s"), col("doc_id"),
            explode(positionalShinglesFast(col("toks"), s)).as("pf"))
          .select(col("s"), col("doc_id"), col("pf.p").as("p"), col("pf.fp").as("fp"))
      }.reduce(_ unionAll _).localCheckpoint()
      val cand = wAll.groupBy("s", "fp").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
      wAll.join(cand, Seq("s", "fp"))
        .join(tk, "doc_id")
        .select(col("s"),
          array_join(slice(col("toks"), col("p"), col("s")), " ").as("span"))
        .groupBy("s", "span").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
        .select("s").distinct()
        .collect().map(_.getInt(0)).toSet
    }

    val empty = Seq.empty[(Long, Long, String)].toDF("lrs_len", "n_occ", "span")
    val maxLen = tk.agg(max(size(col("toks"))).as("m")).collect()(0).getInt(0)
    if (maxLen < 1) empty
    else {
      // no upfront repeatedAt(1) guard: S=1 is the most EXPENSIVE probe
      // (every token a candidate), and bisection doesn't need it — if no
      // width repeats, every probe is false, lo converges to 1, and the
      // final verifiedSpans(1) comes back empty
      var lo = 1; var hi = maxLen
      while (lo < hi) {
        val w = hi - lo
        val n = math.min(ProbesPerPass, w)
        val ps = (1 to n)
          .map(i => lo + math.max(1L, w.toLong * i / (n + 1)).toInt)
          .distinct.filter(p => p > lo && p <= hi)
        val reps = repeatedIn(ps)
        if (reps.nonEmpty) lo = reps.max
        val nonRep = ps.filterNot(reps)
        if (nonRep.nonEmpty) hi = nonRep.min - 1
      }
      // materialize the 1-row answer: the lo==1 emptiness check and the
      // caller's own evaluation would otherwise each replay the full
      // width-lo verification pass (round 17; durability: round-12
      // ledger class)
      val win = verifiedSpans(lo)
        .orderBy("span").limit(1)
        .select(lit(lo.toLong).as("lrs_len"), col("n_occ"), col("span"))
        .localCheckpoint()
      if (lo == 1 && win.isEmpty) empty else win
    }
  }

  val all: Seq[QueryDef] =
    Seq(kcenterCoreset, kcenterInc, kcenterArtifact, longestRepeat)
}
