package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHashSql, shinglesSql}
import graft.operators.Dedup

/** Thirteenth batch: closes two loops opened earlier in the round —
  * a PRODUCTION path for containment (the one pairwise tier that was
  * exact-only), and the HLL merge law proven inside the ORACLE gate
  * (the streaming spec asserts it; this makes the driver's
  * hash-compare assert it too).
  */
object CurationQueries13 {

  /** OVERLAP-JOIN prefix filtering for CONTAINMENT ≥ 0.8 — the
    * production path for the asymmetric tier (`q_containment` is the
    * df-capped oracle tier; this is UNCAPPED and exact): if
    * |a∩b| ≥ 0.8·min(|a|,|b|), the smaller side can miss fewer than
    * |s| − ⌈0.8·|s|⌉ + 1 of its own tokens from the intersection, so
    * its rare-first prefix of that size must contain a SHARED token
    * (pigeonhole) — and a shared token lies in the other side's FULL
    * set. Candidates are therefore prefix(d) ⋈ full(e), normalized to
    * ida < idb; exact containment verifies each. The ORACLE is naive
    * full blocking at the same threshold, so no-false-negatives is
    * hash-verified like `q_ppjoin`.
    *
    * SCALE: prefix mass is rare-token mass (hot shingles sort last,
    * never enter prefixes), and the prefix×full join costs
    * Σ_{h∈prefixes} df(h) — bounded by rare-token collisions, not
    * df². No length filter exists for containment (any size pair is
    * admissible), which is exactly why the prefix must come from the
    * SMALLER side — this formulation gets that for free by emitting
    * every doc's prefix and joining against full sets both ways.
    */
  /** Shared prefix-filter + exact-verify machinery for the containment
    * family: edges (ida < idb, cont ≥ 0.8) over `docs`.
    *
    * ROUND-13 SHUFFLE CUT (verdict item 5 — the x1000 disk postmortem):
    * the round-12 shape paid THREE posting-mass exchanges of
    * incompressible polyhash longs — the df-window's h-exchange, the
    * per-doc prefix build's doc-exchange, and the candidate join
    * re-exchanging the raw posting table on h a second time. The cut:
    * ONE explicit h-repartition feeds BOTH h-keyed consumers — the df
    * count-over-window rides it (HashPartitioning(h) satisfies the
    * window's required distribution), and the candidate join's full
    * side reads the SAME shuffle files back through a ReusedExchange,
    * so the join adds no posting-mass exchange of its own (only the
    * ~20%-mass prefix side shuffles for the join).
    *
    * MEASURED VARIANT SELECTION (tools.OverlapProbe, warm min-of-2 at
    * both 100x replicas, receipts in PLANS.md round 13): a rank-window
    * prefix (row_number over (doc_id ORDER BY df,h), no arrays) was
    * tried and REJECTED by its own measurement — the doc-keyed double
    * window costs a full sort of the posting frame where the hash-based
    * collect_list + array_sort sorts only within per-doc groups
    * (perturbed 100x: 29.25 s window-form vs 21.83 s this form; the
    * round-12 ppjoin window-vs-join rule, replayed on the prefix
    * build). The array build stays; the shared-exchange reuse is the
    * round-13 win (25.38 → 21.83 s and −0.22 GB shuffle write on the
    * posting-dominated perturbed replica).
    */
  private def containmentEdges(docs: org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.DataFrame = {
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    // the isnotnull(doc_id) no-op mirrors the constraint the optimizer
    // infers on the candidate-join branch (pid =!= fid is
    // null-intolerant): without it the two consumers' exchange subtrees
    // canonicalize DIFFERENTLY and ReuseExchange cannot fire — the
    // whole point of the shared repartition
    val hsH = hs.filter(col("doc_id").isNotNull).repartition(col("h"))
    val sorted = hsH
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("sh"))
    // prefix size |d| - ceil(0.8|d|) + 1; ceil(8n/10) = (8n+9) DIV 10
    val pref = sorted.select(col("doc_id"),
      explode(expr("slice(sh, 1, CAST(size(sh) - (8 * size(sh) + 9) DIV 10 + 1 AS INT))"))
        .as("p"))
      .select(col("doc_id").as("pid"), col("p.h").as("h"))
    val cand = pref.join(hsH.select(col("doc_id").as("fid"), col("h")), "h")
      .filter(col("pid") =!= col("fid"))
      .select(least(col("pid"), col("fid")).as("ida"),
        greatest(col("pid"), col("fid")).as("idb"))
      .distinct()
    // verify from map-side sets: no corpus aggregation in the verify.
    // Both verify ends read the set frame — one materialization
    // (round 16; durability: round-12 ledger class)
    Dedup.jaccardForPairsSets(cand,
        Dedup.shingleSets(docs, "doc_id", "text", 3).localCheckpoint(), "doc_id")
      .withColumn("cont", col("i").cast("double") / least(col("ca"), col("cb")))
      .filter(col("cont") >= 0.8)
      .select(col("ida"), col("idb"), col("cont"))
  }

  val overlapJoin: QueryDef = QueryDef.sql(
    "q_overlap_join",
    s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql("string_split(text, ' ')", 3)}) AS s
       |            FROM documents),
       |hs AS (SELECT DISTINCT doc_id, ${polyHashSql("s")} AS h FROM sh),
       |card AS (SELECT doc_id, count(*) AS c FROM hs GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
       |          FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT i.ida, i.idb,
       |       CAST(i.i AS DOUBLE) / least(ca.c, cb.c) AS containment
       |FROM inter i JOIN card ca ON ca.doc_id = i.ida
       |             JOIN card cb ON cb.doc_id = i.idb
       |WHERE CAST(i.i AS DOUBLE) / least(ca.c, cb.c) >= 0.8""".stripMargin) {
    (spark, dir) =>
      containmentEdges(Tables(spark, dir, "documents"))
        .select(col("ida"), col("idb"), col("cont").as("containment"))
  }

  /** CAPPED containment diagnostic (round 12, verdict item 6) — the
    * bounded companion of [[overlapJoin]]: that reporter's output IS
    * the pair list, Θ(cluster²) on a mega-duplicate corpus BY
    * DEFINITION (143 s at the 100x dup replica, honestly priced in
    * PLANS.md). What a pipeline dashboard actually consults is the
    * per-DOCUMENT summary — how many containment partners each doc has
    * at ≥0.8 and the strongest one — which is Θ(docs) output at any dup
    * rate. Same machinery, same threshold, aggregated instead of
    * enumerated.
    *
    * SCALE — the weighted-representative contraction applied to a
    * per-doc rollup: candidates and containment are functions of TEXT
    * alone, so exact-dup cluster members all share one summary —
    * within a cluster every member pairs with the other n−1 at
    * containment 1.0 (identical sets), and a verified rep edge (A,B)
    * gives every member of A exactly n_B partners at cont(A,B).
    * Prefix-filtered candidate generation and the set-verify run over
    * DISTINCT TEXTS only; the single corpus-shaped step is the final
    * ck-keyed expansion join of the |clusters|-row summary back to
    * members. The mega-dup adversary collapses to one rep before any
    * pair machinery — CI-gated slope in ScaleSlopeSpec's family.
    */
  val overlapTop: QueryDef = QueryDef.sql(
    "q_overlap_top",
    s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql("string_split(text, ' ')", 3)}) AS s
       |            FROM documents),
       |hs AS (SELECT DISTINCT doc_id, ${polyHashSql("s")} AS h FROM sh),
       |card AS (SELECT doc_id, count(*) AS c FROM hs GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
       |          FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |prs AS (SELECT i.ida, i.idb,
       |               CAST(i.i AS DOUBLE) / least(ca.c, cb.c) AS cont
       |        FROM inter i JOIN card ca ON ca.doc_id = i.ida
       |                     JOIN card cb ON cb.doc_id = i.idb
       |        WHERE CAST(i.i AS DOUBLE) / least(ca.c, cb.c) >= 0.8),
       |dd AS (SELECT ida AS doc_id, cont FROM prs
       |       UNION ALL SELECT idb, cont FROM prs)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_partners,
       |       max(cont) AS max_containment
       |FROM dd GROUP BY 1""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    val base = docs.select(col("doc_id"), Dedup.contentKey(col("text")).as("ck"))
    val cl = base.groupBy("ck")
      .agg(min(col("doc_id")).as("rid"), count(lit(1)).as("n"))
      // Θ(texts) cluster frame, read by the rep filter, the summary,
      // and the expansion (durability: lineage-severed, non-replicated
      // — the round-12 ledger class)
      .localCheckpoint()
    // prefix-filtered candidates + set verify over DISTINCT texts only
    // (the shared round-13 two-exchange backbone — see containmentEdges)
    val repDocs = docs.join(cl.select(col("rid")),
      docs("doc_id") === col("rid"), "left_semi")
    // the verified edge set feeds BOTH direction legs of the partner
    // rollup — one materialization, or the whole prefix-join + verify
    // pipeline replays per leg (round 16; edge-bounded; durability:
    // round-12 ledger class)
    val edges = containmentEdges(repDocs).localCheckpoint()
    // per-rep external partner mass and best cross containment (no
    // broadcast hint — the weight frame is Θ(texts), AQE decides)
    val wts = cl.select(col("rid"), col("n"))
    val ext = edges
      .join(wts.select(col("rid").as("idb"), col("n").as("nb")), "idb")
      .select(col("ida").as("rid"), col("nb").as("mass"), col("cont"))
      .unionByName(edges
        .join(wts.select(col("rid").as("ida"), col("n").as("na")), "ida")
        .select(col("idb").as("rid"), col("na").as("mass"), col("cont")))
      .groupBy("rid").agg(sum("mass").as("ext"), max("cont").as("maxc"))
    // docs with <3 tokens have NO shingles, never sign, never pair —
    // and by construction never appear in `edges`; within-cluster 1.0
    // partners require a non-empty set, which having any edge or any
    // shingle implies. Detect shingled clusters map-side from the
    // per-rep set kernel (one row per doc, no exchange, no distinct).
    val shingled = Dedup.shingleSets(repDocs, "doc_id", "text", 3)
      .select(col("doc_id").as("rid"))
      .withColumn("hasSh", lit(true))
    val summary = cl.join(ext, Seq("rid"), "left")
      .join(shingled, Seq("rid"), "left")
      .select(col("ck"),
        (when(coalesce(col("hasSh"), lit(false)) && col("n") >= 2, col("n") - 1)
          .otherwise(0L) + coalesce(col("ext"), lit(0L))).as("n_partners"),
        when(coalesce(col("hasSh"), lit(false)) && col("n") >= 2,
          greatest(lit(1.0), coalesce(col("maxc"), lit(0.0))))
          .otherwise(col("maxc")).as("max_containment"))
      .filter(col("n_partners") >= 1)
    base.join(summary, "ck")
      .select(col("doc_id"), col("n_partners"), col("max_containment"))
  }

  /** HLL MERGE LAW in the oracle gate: split events into halves by
    * event_id parity, build the q_hll_sketch registers for each half
    * and for the whole stream, max-merge the halves, and report the
    * per-type register diff count against the whole — ZERO rows of
    * disagreement is the mergeability theorem (max is commutative /
    * associative / idempotent) as a driver-verified number, plus the
    * estimate from the whole for context. SCALE: three
    * (type × 256)-bounded register builds + a 256-key merge; this is
    * the exact reduce a 1000-executor fleet runs, priced at
    * aggregate-only cost.
    */
  val hllMerge: QueryDef = QueryDef.sql(
    "q_hll_merge",
    s"""WITH k AS (SELECT event_type, event_id,
       |                 CAST(user_id AS VARCHAR) || '@' || strftime(ts, '%Y-%m-%d') AS key
       |          FROM events),
       |r AS (SELECT event_type, event_id,
       |             (xi * xi) % 1000000007 % 256 AS idx,
       |             CASE WHEN (xr * xr) % 1000000007 % 4194304 = 0 THEN 23
       |                  ELSE 23 - length(bin((xr * xr) % 1000000007 % 4194304)) END AS rho
       |      FROM (SELECT event_type, event_id,
       |                   ${polyHashSql("'i#' || key")} AS xi,
       |                   ${polyHashSql("'r#' || key")} AS xr FROM k)),
       |ra AS (SELECT event_type, idx, max(rho) AS m FROM r WHERE event_id % 2 = 0 GROUP BY 1, 2),
       |rb AS (SELECT event_type, idx, max(rho) AS m FROM r WHERE event_id % 2 = 1 GROUP BY 1, 2),
       |rw AS (SELECT event_type, idx, max(rho) AS m FROM r GROUP BY 1, 2),
       |merged AS (SELECT event_type, idx, max(m) AS m
       |           FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1, 2),
       |diff AS (SELECT w.event_type,
       |                count(*) FILTER (WHERE coalesce(mg.m, -1) <> w.m) AS n_diff,
       |                count(*) AS n_regs
       |         FROM rw w LEFT JOIN merged mg
       |           ON mg.event_type = w.event_type AND mg.idx = w.idx
       |         GROUP BY 1),
       |est0 AS (SELECT g.event_type,
       |                sum(1.0 / CAST((1::BIGINT << coalesce(rw.m, 0)) AS DOUBLE)) AS s,
       |                count(*) FILTER (WHERE coalesce(rw.m, 0) = 0) AS v
       |         FROM (SELECT DISTINCT event_type FROM events) g
       |         CROSS JOIN (SELECT unnest(range(0, 256)) AS idx) u
       |         LEFT JOIN rw ON rw.event_type = g.event_type AND rw.idx = u.idx
       |         GROUP BY 1),
       |est AS (SELECT event_type,
       |               CASE WHEN 0.7213 / (1 + 1.079 / 256) * 65536 / s <= 640 AND v > 0
       |                    THEN CAST(floor(256 * ln(256.0 / v)) AS BIGINT)
       |                    ELSE CAST(floor(0.7213 / (1 + 1.079 / 256) * 65536 / s) AS BIGINT)
       |               END AS est
       |        FROM est0)
       |SELECT d.event_type, CAST(d.n_regs AS BIGINT) AS n_regs,
       |       CAST(d.n_diff AS BIGINT) AS n_reg_diff, est.est AS est_whole
       |FROM diff d JOIN est USING (event_type)""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    // same hash algebra as q_hll_sketch / SketchStreams, with event_id
    // carried through for the parity split
    val r = graft.streaming.SketchStreams.hllPrepWithId(ev)
    // ROUND-16 SHAPE (guide §2.3/§2.4): ONE corpus pass computes all
    // three register sets as conditional maxes of one (type, idx)
    // aggregate — the half-split registers are max(rho) over the even/
    // odd rows of the SAME group, so ra/rb/rw never needed separate
    // passes (the first cut ran three register builds plus a fourth
    // scan for the type grid — 10 scans / 20 exchanges). The merged
    // register is greatest(ma, mb) per group — the union+re-aggregate
    // disappears. The (types × 256)-bounded frame is materialized once
    // and feeds the diff, the grid, and the estimator (localCheckpoint;
    // single-JVM durability note as per the q_ivf_kmeans site).
    val regs = r.groupBy("event_type", "idx")
      .agg(max(when(col("event_id") % 2 === 0, col("rho"))).as("ma"),
        max(when(col("event_id") % 2 === 1, col("rho"))).as("mb"),
        max(col("rho")).as("m"))
      .localCheckpoint()
    val diff = regs
      .groupBy(col("event_type"))
      .agg(count(when(coalesce(greatest(col("ma"), col("mb")), lit(-1)) =!= col("m"), 1))
          .as("n_diff"),
        count(lit(1)).as("n_regs"))
    val grid = regs.select("event_type").distinct()
      .crossJoin(spark.range(256).select(col("id").as("idx")))
    val fullReg = grid.join(regs.select(col("event_type"), col("idx"), col("m")),
        Seq("event_type", "idx"), "left")
      .select(col("event_type"), coalesce(col("m"), lit(0)).as("m"))
    val alphaM2 = lit(0.7213) / (lit(1) + lit(1.079) / 256) * 65536
    val est = fullReg.groupBy("event_type")
      .agg(sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)")).as("s"),
        count(when(col("m") === 0, 1)).as("v"))
      .select(col("event_type"),
        when(alphaM2 / col("s") <= 640 && col("v") > 0,
          floor(lit(256) * log(lit(256.0) / col("v"))).cast("long"))
          .otherwise(floor(alphaM2 / col("s")).cast("long")).as("est_whole"))
    diff.join(est, "event_type")
      .select(col("event_type"), col("n_regs"), col("n_diff").as("n_reg_diff"),
        col("est_whole"))
  }

  /** TOKEN-BUDGET CORPUS SELECTION — "keep the best quarter of the
    * corpus, measured in tokens": the selection op behind every
    * quality-pruned training set. The scale-correct shape is NOT a
    * corpus-global sort by quality (that's a single-partition
    * anti-pattern at 100 TB); it's the `q_token_cdf` histogram trick on
    * the quality axis: bucket docs by integer score (type-token ratio
    * in basis points, the `q_quality_filter` signal — ≤ 10 001 distinct
    * values by construction), aggregate doc/token mass per bucket
    * map-side, then run the cumulative-sum cutoff over the BOUNDED
    * bucket table. Output = every bucket the budget touches, marked
    * `full` or `partial` (the crossing bucket); the per-doc apply is
    * then a map-side `score > cutoff` filter plus a quota in the one
    * partial bucket. The only data crossing a SinglePartition exchange
    * is the score histogram, never the corpus.
    */
  val budgetSelect: QueryDef = QueryDef.sql(
    "q_budget_select",
    """WITH m AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(floor(n_uniq * 10000.0 / n_tokens) AS BIGINT) AS score_bp
      |  FROM m WHERE n_tokens > 0),
      |b AS (
      |  SELECT score_bp, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens
      |  FROM s GROUP BY 1),
      |c AS (
      |  SELECT score_bp, n_docs, bucket_tokens,
      |         CAST(sum(bucket_tokens) OVER (ORDER BY score_bp DESC) AS BIGINT) AS cum_tokens,
      |         CAST(sum(bucket_tokens) OVER () AS BIGINT) AS t
      |  FROM b)
      |SELECT score_bp, n_docs, bucket_tokens, cum_tokens,
      |       CASE WHEN cum_tokens <= t // 4 THEN 'full' ELSE 'partial' END AS taken
      |FROM c
      |WHERE cum_tokens - bucket_tokens < t // 4""".stripMargin) { (spark, dir) =>
    val toks = split(col("text"), " ")
    val s = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        floor(col("n_uniq") * 10000.0 / col("n_tokens")).cast("long").as("score_bp"))
    val b = s.groupBy("score_bp")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").cast("long").as("bucket_tokens"))
    // both the running cutoff and the corpus total ride ONE window over
    // the score histogram (<= 10 001 rows — the q_token_cdf precedent
    // for a deliberate SinglePartition exchange); the corpus is scanned
    // and tokenized exactly once
    val w = Window.orderBy(col("score_bp").desc)
    val c = b
      .withColumn("cum_tokens", sum("bucket_tokens").over(w).cast("long"))
      .withColumn("t", sum("bucket_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).cast("long"))
    c.filter(col("cum_tokens") - col("bucket_tokens") < expr("t DIV 4"))
      .select(col("score_bp"), col("n_docs"), col("bucket_tokens"), col("cum_tokens"),
        when(col("cum_tokens") <= expr("t DIV 4"), "full").otherwise("partial").as("taken"))
  }

  val all: Seq[QueryDef] = Seq(overlapJoin, overlapTop, hllMerge, budgetSelect)
}
