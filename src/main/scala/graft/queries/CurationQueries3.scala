package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql, tokens}
import graft.functions.VectorFunctions.{cosDistSql, cosineDistance}

/** Third curation batch: boilerplate span mining, cluster-scoped semantic
  * dedup (the SemDeDup recipe), mixture rebalancing, n-gram novelty
  * scoring, and the cumulative token-budget curve. Determinism discipline
  * unchanged: integer counts/ranks/fingerprints; doubles only from the
  * shared cosine algebra or exact integer ratios.
  */
object CurationQueries3 {

  /** Boilerplate span mining — 16-token windows (stride 8, the
    * `q_token_windows` unit) occurring in ≥2 DISTINCT documents, ranked
    * by spread: the frequent-span detector that finds headers, license
    * blocks and navigation chrome before they pollute dedup and LM
    * statistics. Windows travel as BIGINT fingerprints; the group state
    * per fp is two counters, and the top-20 is a heap-merge
    * (`TakeOrderedAndProject`), never a global sort.
    */
  val boilerplateSpans: QueryDef = QueryDef.sql(
    "q_boilerplate_spans",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |w AS (SELECT doc_id,
       |             ${polyHashSql("array_to_string(toks[w*8+1 : w*8+16], ' ')")} AS fp
       |      FROM tk, unnest(range(0, (len(toks) + 7) // 8)) t(w)),
       |g AS (SELECT fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
       |      FROM w GROUP BY fp)
       |SELECT fp, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_occ AS BIGINT) AS n_occ
       |FROM g WHERE n_docs >= 2
       |ORDER BY n_docs DESC, n_occ DESC, fp LIMIT 20""".stripMargin) { (spark, dir) =>
    // toks materialized once per row (the q_token_windows lesson)
    val toks = col("toks")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), ((size(toks) - 1) / lit(8)).cast("int")),
        w => slice(toks, w * 8 + 1, lit(16)))).as("win"))
      .select(col("doc_id"), polyHash(array_join(col("win"), " ")).as("fp"))
      .groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("fp").asc)
      .limit(20)
  }

  /** Cluster-scoped semantic dedup — the SemDeDup recipe: assign every
    * embedding to its nearest seeded centroid (quantized-L2 argmin, ties
    * to lower cluster), then find near-identical pairs ONLY within a
    * cluster (cosine distance ≤ 0.6 — calibrated to this corpus, whose
    * closest pairs sit at ~0.5; keep = lower id by convention). Cluster
    * blocking is what makes semantic dedup tractable at corpus scale:
    * pair candidates are bounded by cluster size, never corpus² — which
    * REQUIRES k to grow with the corpus. k = max(8, N div 64) in BOTH
    * engines (the `scaledBitsPerBand` pattern), holding expected cluster
    * size at ~64 as N grows; the within-cluster pair mass then stays
    * ~64·N/2, i.e. corpus-linear. And because k ∝ N makes a FLAT argmin
    * O(N·k) = quadratic (measured: slope 3.06 at a 100× probe), the
    * assignment is TWO-LEVEL ([[graft.operators.IvfIndex.twoLevelAssign]]
    * with k1 = ⌈√k⌉): nearest coarse cell, then argmin over that cell's
    * fine seeds — O(N·√k), the IVF nprobe=1 semantic, defined identically
    * in the oracle below. The Spark-side count is a parquet metadata read
    * (the same driver-side scalar `q_semdedup_recall` already derives its
    * band width from). Cross-cluster near-dups are missed by design —
    * the documented SemDeDup trade, measured by `q_semdedup_recall`.
    */
  /** Shared CTE chain for the SemDeDup family: corpus-scaled config,
    * two-level assignment `s1 (vec_id, cluster)`, and the within-cluster
    * verified near-pairs `prs (cluster, ida, idb, dist)` — composed by
    * [[semDedup]] (the pair report) and [[semDedupPrune]] (the apply
    * step) so the two oracles cannot drift.
    */
  private val SemCte: String =
    s"""cfg AS (SELECT greatest(8, count(*) // 64) AS k,
       |             CAST(ceil(sqrt(CAST(greatest(8, count(*) // 64) AS DOUBLE))) AS BIGINT) AS k1
       |      FROM embeddings),
       |ed AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       |            FROM embeddings, UNNEST(range(1, 65)) t(i)),
       |c0 AS (SELECT vec_id AS cluster, i, x AS c FROM ed, cfg WHERE vec_id < cfg.k),
       |g0 AS (SELECT vec_id AS ccell, i, x AS g FROM ed, cfg WHERE vec_id < cfg.k1),
       |pd AS (SELECT c0.cluster, g0.ccell,
       |              CAST(sum(CAST(floor((c0.c - g0.g) * (c0.c - g0.g) * 35184372088832.0) AS BIGINT)) AS BIGINT) AS d2
       |       FROM c0 JOIN g0 ON g0.i = c0.i GROUP BY 1, 2),
       |par AS (SELECT cluster, parent FROM (
       |          SELECT cluster, ccell AS parent,
       |                 row_number() OVER (PARTITION BY cluster ORDER BY d2, ccell) AS rn
       |          FROM pd) WHERE rn = 1),
       |cd AS (SELECT ed.vec_id, g0.ccell,
       |              CAST(sum(CAST(floor((ed.x - g0.g) * (ed.x - g0.g) * 35184372088832.0) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN g0 ON g0.i = ed.i GROUP BY 1, 2),
       |vc AS (SELECT vec_id, ccell FROM (
       |         SELECT vec_id, ccell,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, ccell) AS rn
       |         FROM cd) WHERE rn = 1),
       |a1 AS (SELECT ed.vec_id, c0.cluster,
       |              CAST(sum(CAST(floor((ed.x - c0.c) * (ed.x - c0.c) * 35184372088832.0) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN vc ON vc.vec_id = ed.vec_id
       |               JOIN par ON par.parent = vc.ccell
       |               JOIN c0 ON c0.cluster = par.cluster AND c0.i = ed.i
       |       GROUP BY 1, 2),
       |s1 AS (SELECT vec_id, cluster FROM (
       |         SELECT vec_id, cluster,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |         FROM a1) WHERE rn = 1),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |prs AS (SELECT sa.cluster, a.vec_id AS ida, b.vec_id AS idb,
       |               ${cosDistSql("a.v", "b.v")} AS dist
       |        FROM e a JOIN s1 sa ON sa.vec_id = a.vec_id
       |             JOIN s1 sb ON sb.cluster = sa.cluster
       |             JOIN e b ON b.vec_id = sb.vec_id AND a.vec_id < b.vec_id
       |        WHERE ${cosDistSql("a.v", "b.v")} <= 0.6)""".stripMargin

  /** Spark-side shared pieces: (memberships `s1`-equivalent
    * (vec_id, cluster), verified within-cluster near-pairs).
    */
  private def semParts(spark: org.apache.spark.sql.SparkSession,
                       dir: String): (org.apache.spark.sql.DataFrame,
                                      org.apache.spark.sql.DataFrame) = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // corpus-scaled k: constant expected cluster size (~64) as N grows;
    // two-level assignment keeps the argmin O(N·√k) instead of O(N·k)
    val k = math.max(8L, emb.count() / 64)
    val k1 = math.ceil(math.sqrt(k.toDouble)).toLong
    val cent0 = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    val asg = graft.operators.IvfIndex.twoLevelAssign(emb, cent0, k1)
    val side = emb.join(asg, "vec_id")
    val a = side.select(col("cluster"), col("vec_id").as("ida"), col("embedding").as("va"))
    val b = side.select(col("cluster"), col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.join(b, "cluster")
      .filter(col("ida") < col("idb"))
      .withColumn("dist", cosineDistance(col("va"), col("vb")))
      .filter(col("dist") <= 0.6)
      .select(col("cluster"), col("ida"), col("idb"), col("dist"))
    (side.select(col("vec_id"), col("cluster")), pairs)
  }

  val semDedup: QueryDef = QueryDef.sql(
    "q_semdedup",
    s"""WITH $SemCte
       |SELECT cluster, ida, idb, dist FROM prs""".stripMargin) { (spark, dir) =>
    semParts(spark, dir)._2
  }

  /** The APPLY step of [[semDedup]] — the `q_boilerplate_strip` mine→
    * apply symmetry for semantic dedup: drop every document with a
    * smaller-id near-identical neighbor IN ITS CLUSTER (the greedy
    * min-id-keeper rule; deliberately NOT the iterative independent
    * set, which needs a sequential pass — same keep convention as
    * `q_dedup_canonical`), and report the per-cluster funnel:
    * members, dropped, kept, drop rate in basis points. The drop list
    * is DISTINCT idb off the verified pair stream; membership counts
    * come from the assignment — both shared fragments, so the apply
    * step costs one anti-join more than the mine step.
    */
  val semDedupPrune: QueryDef = QueryDef.sql(
    "q_semdedup_prune",
    s"""WITH $SemCte,
       |drp AS (SELECT DISTINCT idb AS vec_id FROM prs),
       |per AS (SELECT s1.cluster, count(*) AS n_members, count(drp.vec_id) AS n_dropped
       |        FROM s1 LEFT JOIN drp USING (vec_id) GROUP BY 1)
       |SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
       |       CAST(n_dropped AS BIGINT) AS n_dropped,
       |       CAST(n_members - n_dropped AS BIGINT) AS n_kept,
       |       CAST(floor(n_dropped * 10000.0 / n_members) AS BIGINT) AS drop_bp
       |FROM per""".stripMargin) { (spark, dir) =>
    val (members, pairs) = semParts(spark, dir)
    val drp = pairs.select(col("idb").as("vec_id")).distinct()
      .withColumn("hit", lit(1))
    members.join(drp, Seq("vec_id"), "left")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"), count(col("hit")).as("n_dropped"))
      .select(col("cluster"), col("n_members"), col("n_dropped"),
        (col("n_members") - col("n_dropped")).as("n_kept"),
        floor(col("n_dropped") * 10000.0 / col("n_members")).cast("long").as("drop_bp"))
  }

  /** Mixture rebalancing — per-language keep rates that level the corpus
    * toward a uniform language mix: rate = min(1, target/actual) with
    * target = ⌊total/n_langs⌋. The sampling-rate computation that
    * precedes `q_domain_mix`'s hash-gated application. All integer
    * arithmetic (products stay < 2^53, so both engines' doubles are
    * exact); one vocabulary-sized aggregate plus a broadcast total.
    */
  val mixRebalance: QueryDef = QueryDef.sql(
    "q_mix_rebalance",
    """WITH s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot, CAST(count(*) AS BIGINT) AS nl FROM s)
      |SELECT s.lang, s.n,
      |       CAST(floor(t.tot / t.nl) AS BIGINT) AS target_docs,
      |       CAST(least(10000, floor(floor(t.tot / t.nl) * 10000.0 / s.n)) AS BIGINT) AS keep_bp,
      |       CAST(floor(s.n * least(10000, floor(floor(t.tot / t.nl) * 10000.0 / s.n)) / 10000.0) AS BIGINT) AS expect_kept
      |FROM s, t""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val t = s.agg(sum(col("n")).as("tot"), count(lit(1)).as("nl"))
    val target = floor(col("tot") / col("nl"))
    val keepBp = least(lit(10000L), floor(target * 10000.0 / col("n")))
    s.crossJoin(broadcast(t))
      .select(col("lang"), col("n"),
        target.cast("long").as("target_docs"),
        keepBp.cast("long").as("keep_bp"),
        floor(col("n") * keepBp / 10000.0).cast("long").as("expect_kept"))
  }

  /** N-gram novelty score — the fraction of each document's distinct
    * trigrams seen NOWHERE else in the corpus (df = 1), in basis points:
    * high novelty separates genuinely new content from remixes and
    * boilerplate (the memorization-risk complement of `q_repetition`).
    * Trigrams travel as BIGINT polynomial hashes through one df join.
    */
  val ngramNovelty: QueryDef = QueryDef.sql(
    "q_ngram_novelty",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |tg AS (SELECT DISTINCT doc_id,
       |              ${polyHashSql("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")} AS h
       |       FROM tk, unnest(range(1, len(toks) - 1)) t(i)),
       |df AS (SELECT h, count(*) AS df FROM tg GROUP BY h)
       |SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_tri,
       |       CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |       CAST(floor(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 10000.0
       |                  / count(*)) AS BIGINT) AS novel_bp
       |FROM tg JOIN df USING (h)
       |GROUP BY tg.doc_id""".stripMargin) { (spark, dir) =>
    val toks = col("toks")
    val tg = Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(toks) >= 3)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))).as("tri"))
      .select(col("doc_id"), polyHash(col("tri")).as("h"))
      // round-13 fusion attempt, REJECTED by measurement: an explicit
      // h-repartition CAN carry both the distinct and the df-window
      // (HashPartitioning(h) ⊆ ClusteredDistribution(doc_id, h)) —
      // one corpus exchange instead of two — but the fused form
      // measured 4.15 s vs this form's 2.37 s warm at the 100x
      // perturbed replica: the single wide post-shuffle stage (full
      // dedup hash table + window sort back-to-back) costs more than
      // the exchange it saves, while the split form dedups map-side
      // and sorts a smaller frame. Rule recorded in PLANS.md round 13
      // (exchange-fusion counterpart of the ppjoin window-vs-join rule).
      .distinct()
    // df via count-over-window on ONE h-keyed exchange (round-12
    // containment-family cut: the groupBy + re-join form shuffles the
    // corpus-trigram table twice)
    tg.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("df") === 1, 1).otherwise(0)).cast("long").as("n_novel"),
        floor(sum(when(col("df") === 1, 1).otherwise(0)) * 10000.0 / count(lit(1)))
          .cast("long").as("novel_bp"))
  }

  /** Cumulative token-budget curve — docs ranked by length into 10
    * ntile deciles, with each decile's token volume and the running
    * cumulative share in basis points: "what fraction of corpus tokens
    * live in the longest N% of documents", the truncation-budget
    * planning view. Integer-exact; the running sum is a 10-row window.
    *
    * Scale shape (the round-6 `weak` fix): the Spark side does NOT run
    * `ntile` over the corpus — that is a one-task global sort. Instead it
    * replicates ntile(10) EXACTLY from each row's global rank
    * rn = (#rows with longer n) + (row_number among equal-n rows), where
    * the first term comes from a running sum over the length HISTOGRAM
    * (cardinality ≤ max document token count — corpus-independent) and
    * the second from a window PARTITIONED by length. The rn→bucket map is
    * the closed-form ntile function (first n%10 buckets get ⌈N/10⌉ rows)
    * evaluated map-side. The only single-partition exchanges left ride
    * the histogram and the 10-row decile table, never the corpus. The
    * DuckDB oracle keeps the textbook `ntile` — proving the distributed
    * rank algebra IS ntile.
    */
  val tokenCdf: QueryDef = QueryDef.sql(
    "q_token_cdf",
    """WITH m AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |           FROM documents),
      |r AS (SELECT doc_id, n, ntile(10) OVER (ORDER BY n DESC, doc_id) AS decile FROM m),
      |d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
      |             CAST(sum(n) AS BIGINT) AS tokens
      |      FROM r GROUP BY decile),
      |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot FROM d)
      |SELECT CAST(d.decile AS BIGINT) AS decile, d.n_docs, d.tokens,
      |       CAST(floor(sum(d.tokens) OVER (ORDER BY d.decile) * 10000.0 / t.tot) AS BIGINT)
      |         AS cum_bp
      |FROM d, t""".stripMargin) { (spark, dir) =>
    // TOKENIZE ONCE (the round-8 exchange-reuse item): the histogram
    // branch and the ranked branch exchange DIFFERENT payloads on n, so
    // ReusedExchange can't merge them — instead the 16-byte-per-doc
    // (doc_id, n) frame is materialized once and both branches read it,
    // instead of each re-scanning and re-tokenizing the text corpus
    val m = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .localCheckpoint()
    // length histogram: bounded by max token count, never corpus-sized
    val hist = m.groupBy("n").agg(count(lit(1)).as("cnt"))
    val before = hist
      .withColumn("before", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("n").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("n").as("hn"), col("before"))
    val tot = hist.agg(sum(col("cnt")).as("nrows"))
    // global rank without a global sort: histogram offset + rank within
    // the equal-length group (window partitioned by n)
    val ranked = m
      .join(broadcast(before), col("n") === col("hn"))
      .withColumn("rwithin", row_number().over(
        Window.partitionBy(col("n")).orderBy(col("doc_id").asc)))
      .crossJoin(broadcast(tot))
      .withColumn("rn", col("before") + col("rwithin"))
      // closed-form ntile(10): the first (nrows % 10) buckets take
      // (nrows DIV 10 + 1) rows, the rest (nrows DIV 10); greatest()
      // guards the (unreachable when nrows < 10) zero divisor
      .withColumn("decile", expr(
        """CASE WHEN rn <= (nrows % 10) * (nrows DIV 10 + 1)
          |     THEN (rn - 1) DIV (nrows DIV 10 + 1) + 1
          |     ELSE (nrows % 10)
          |          + (rn - (nrows % 10) * (nrows DIV 10 + 1) - 1)
          |            DIV greatest(nrows DIV 10, 1) + 1
          |END""".stripMargin))
    val d = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tokens"))
    val t = d.agg(sum(col("tokens")).as("tot"))
    d.crossJoin(broadcast(t))
      .withColumn("cum_bp",
        floor(sum(col("tokens")).over(Window.orderBy(col("decile"))) * 10000.0 / col("tot"))
          .cast("long"))
      .select(col("decile").cast("long").as("decile"), col("n_docs"),
        col("tokens"), col("cum_bp"))
  }

  /** The APPLY step of [[boilerplateSpans]]: per-document count of token
    * positions covered by any cross-document repeated window (the spans
    * a cleaner would strip), with the kept-token count and stripped
    * share in basis points. Coverage is the exact union of overlapping
    * windows — computed as DISTINCT covered positions, so the stride-8 /
    * width-16 overlap never double-counts. Fingerprints are the join
    * key; positions explode to ≤2 rows per token (width/stride), keeping
    * the whole pass corpus-linear.
    */
  val boilerplateStrip: QueryDef = QueryDef.sql(
    "q_boilerplate_strip",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tk),
       |w AS (SELECT doc_id, w,
       |             ${polyHashSql("array_to_string(toks[w*8+1 : w*8+16], ' ')")} AS fp,
       |             len(toks) AS nt
       |      FROM tk, unnest(range(0, (len(toks) + 7) // 8)) t(w)),
       |b AS (SELECT fp FROM w GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
       |cov AS (SELECT DISTINCT ww.doc_id, p
       |        FROM w ww JOIN b ON b.fp = ww.fp,
       |             unnest(range(ww.w*8 + 1, least(ww.w*8 + 16, ww.nt) + 1)) t(p)),
       |c AS (SELECT doc_id, count(*) AS covered FROM cov GROUP BY doc_id)
       |SELECT n.doc_id, n.n_tokens,
       |       CAST(coalesce(c.covered, 0) AS BIGINT) AS covered,
       |       CAST(n.n_tokens - coalesce(c.covered, 0) AS BIGINT) AS kept_tokens,
       |       CAST(floor(coalesce(c.covered, 0) * 10000.0 / n.n_tokens) AS BIGINT) AS strip_bp
       |FROM n LEFT JOIN c ON c.doc_id = n.doc_id""".stripMargin) { (spark, dir) =>
    val toks = col("toks")
    val tk = Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val n = tk.select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
    val w = tk
      .select(col("doc_id"), size(toks).as("nt"),
        posexplode(transform(
          sequence(lit(0), ((size(toks) - 1) / lit(8)).cast("int")),
          wi => slice(toks, wi * 8 + 1, lit(16)))).as(Seq("w", "win")))
      .select(col("doc_id"), col("w"), col("nt"), polyHash(array_join(col("win"), " ")).as("fp"))
      // narrow (id, w, nt, fp) frame consumed by the boilerplate filter
      // AND the coverage join — one tokenize+fingerprint pass, not two
      // (round 16; durability: round-12 ledger class)
      .localCheckpoint()
    val b = w.groupBy("fp").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("fp").as("bfp"))
    val cov = w.join(b, col("bfp") === col("fp"))
      .select(col("doc_id"),
        explode(sequence(col("w") * 8 + 1, least(col("w") * 8 + 16, col("nt")))).as("p"))
      .distinct()
    val c = cov.groupBy(col("doc_id").as("cdoc")).agg(count(lit(1)).as("covered"))
    n.join(c, col("cdoc") === col("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered"), lit(0L)).as("covered"),
        (col("n_tokens") - coalesce(col("covered"), lit(0L))).as("kept_tokens"),
        floor(coalesce(col("covered"), lit(0L)) * 10000.0 / col("n_tokens"))
          .cast("long").as("strip_bp"))
  }

  val all: Seq[QueryDef] = Seq(boilerplateSpans, semDedup, semDedupPrune,
    mixRebalance, ngramNovelty, tokenCdf, boilerplateStrip)
}
