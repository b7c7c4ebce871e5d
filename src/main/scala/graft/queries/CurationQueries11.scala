package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHashSql, shinglesSql, tokens}
import graft.operators.Dedup

/** Eleventh curation batch: graph structure of the near-dup graph
  * (triangle count / global clustering — template families close
  * triangles, chance collisions don't), recursive smoothing over the
  * event stream (integer EWMA — the alerting baseline), the dedup
  * COST report (what each tier would actually delete, in documents
  * and tokens — the number a storage owner asks for first), and the
  * language-ID confusion matrix (per-pair counts + per-label recall —
  * the eval that decides whether the heuristic is shippable).
  */
object CurationQueries11 {

  /** TRIANGLE COUNT + global clustering coefficient over the SimHash
    * near-dup graph (hamming ≤ 1 pairs, the `q_simhash_pairs` edge
    * set — the 60-bit dual-family signature since round 10: the 30-bit
    * graph this rode before floods with chance collisions at corpus
    * scale, decade 3.85 / 141M pairs at 5M docs, which would have made
    * triangles/GCC quadratic exactly when a 100-TB user runs them).
    * Edges are oriented ida < idb, so each triangle a<b<c is
    * counted exactly once by the two-join path a→b→c ∧ a→c; wedges
    * come from the degree table (Σ d·(d−1)/2), and GCC = 3·Δ/wedges
    * in basis points. A high GCC says near-dup pairs come in CLIQUES
    * (template families) rather than chains — which is what makes the
    * min-id-keeper collapse safe. SCALE: two joins on a band-bounded
    * edge set (the LSH cap bounds degree, so path mass is Σd² — the
    * same bound as the pair generators); degree table is node-sized.
    */
  val triangleCount: QueryDef = QueryDef.sql(
    "q_triangle_count",
    s"""WITH ${DedupQueries.SimhashWideCte},
       |${DedupQueries.SimhashWideEdgeCte},
       |tri AS (SELECT count(*) AS t
       |        FROM e e1 JOIN e e2 ON e2.ida = e1.idb
       |                  JOIN e e3 ON e3.ida = e1.ida AND e3.idb = e2.idb),
       |deg AS (SELECT id, count(*) AS d
       |        FROM (SELECT ida AS id FROM e UNION ALL SELECT idb FROM e)
       |        GROUP BY 1),
       |w AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |             CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS wedges FROM deg),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
       |SELECT n_nodes, n_edges, CAST(t AS BIGINT) AS n_triangles,
       |       CAST((3 * t * 10000) // greatest(wedges, 1) AS BIGINT) AS gcc_bp
       |FROM w, ne, tri""".stripMargin) { (spark, dir) =>
    // WEIGHTED-REPRESENTATIVE REWRITE (round 11): the raw edge set is
    // Θ(cluster²) on a mega-duplicate cluster and the triangle path
    // join Θ(cluster³-ish) — the 100x dup-replica probe DID NOT FINISH
    // in 9 minutes (the 10k-copy clique is 50M edges / 1.6e11
    // triangles). But every OUTPUT here is a scalar, and exact
    // duplicates make the graph block-structured: identical text ⇒
    // identical signature ⇒ a cluster is internally COMPLETE (hamming
    // 0) and two clusters' members either all-pair or none. Contract
    // to distinct texts with cluster sizes n as weights; then exactly
    //   edges     = Σ_A C(n_A,2) + Σ_{(A,B)∈E} n_A·n_B
    //   degree    d_A = n_A − 1 + Σ_{B∼A} n_B   (same for every member)
    //   nodes     = Σ n_A over clusters with n_A ≥ 2 or an E-neighbor
    //   wedges    = Σ_A n_A · C(d_A, 2)
    //   triangles = Σ_A C(n_A,3)
    //             + Σ_{(A,B)∈E} [C(n_A,2)·n_B + n_A·C(n_B,2)]
    //             + Σ_{A→B→C path ∧ A→C ∈ E} n_A·n_B·n_C
    // — the path join now runs over DISTINCT-text edges only. Output
    // identical to the raw enumeration (oracle unchanged; the spec's
    // brute-force pin still passes). Signatures ride the collapse
    // exchange as longs; the weight joins carry NO broadcast hint
    // (round 12): the weight table is Θ(texts) ≈ Θ(docs) on a low-dup
    // corpus — past the 8 GB broadcast cap at 100 TB — so AQE picks
    // the build side from exact runtime sizes (the inputs are
    // localCheckpoint'ed) and shuffle-joins when neither fits. Only
    // the 1-row scalar aggregates below keep a forced broadcast.
    val docs = Tables(spark, dir, "documents")
    val base = docs.select(col("doc_id"),
      Dedup.contentKey(col("text")).as("ck"),
      graft.functions.HashExpressions
        .simhashDualFast(tokens(col("text"))).as("simhash"))
    val cl = base.groupBy("ck")
      .agg(min(col("doc_id")).as("rid"), min(col("simhash")).as("simhash"),
        count(lit(1)).as("n"))
      // Θ(texts) cluster frame: sigs + size weights. DURABILITY:
      // lineage-severed, non-replicated (PLANS.md round-12 ledger) —
      // fine in a bench JVM, a reliable checkpoint on preemptible
      // clusters.
      .localCheckpoint()
    val e = Dedup.simhashPairs(cl.select(col("rid"), col("simhash")), "rid", 1, bandBits = 30)
      .select(col("ida"), col("idb")).distinct()
    val wts = cl.select(col("rid"), col("n"))
    val ew = e
      .join(wts.select(col("rid").as("ida"), col("n").as("na")), "ida")
      .join(wts.select(col("rid").as("idb"), col("n").as("nb")), "idb")
      // rep edges + weights feed 4 consumers; pair-bounded, not
      // corpus-bounded, but same durability class (round-12 ledger)
      .localCheckpoint()
    // per-cluster external mass Σ_{B∼A} n_B
    val degE = ew.select(col("ida").as("rid"), col("nb").as("nn"))
      .unionAll(ew.select(col("idb").as("rid"), col("na").as("nn")))
      .groupBy("rid").agg(sum("nn").as("ext"))
    val nodeStats = cl.join(degE, Seq("rid"), "left")
      .select(col("n"), coalesce(col("ext"), lit(0L)).as("ext"))
      .select(col("n"), (col("n") - 1 + col("ext")).as("d"),
        (col("n") >= 2 || col("ext") > 0).as("isNode"))
      .agg(sum(when(col("isNode"), col("n")).otherwise(0L)).cast("long").as("n_nodes"),
        sum(when(col("isNode"), col("n") * expr("d * (d - 1) DIV 2"))
          .otherwise(0L)).cast("long").as("wedges"),
        sum(expr("n * (n - 1) DIV 2")).cast("long").as("e_within"),
        sum(expr("n * (n - 1) * (n - 2) DIV 6")).cast("long").as("t_within"))
    val edgeStats = ew.agg(
      coalesce(sum(col("na") * col("nb")), lit(0L)).cast("long").as("e_cross"),
      coalesce(sum(expr("(na * (na - 1) DIV 2) * nb + na * (nb * (nb - 1) DIV 2)")),
        lit(0L)).cast("long").as("t_mixed"))
    val e2 = ew.select(col("ida").as("idb"), col("idb").as("idc"), col("nb").as("nc"))
    val e3 = ew.select(col("ida").as("ida3"), col("idb").as("idc3"))
    val t3 = ew.join(e2, "idb")
      .join(e3, col("ida") === col("ida3") && col("idc") === col("idc3"))
      .agg(coalesce(sum(col("na") * col("nb") * col("nc")), lit(0L))
        .cast("long").as("t_rep"))
    nodeStats.crossJoin(broadcast(edgeStats)).crossJoin(broadcast(t3))
      .select(col("n_nodes"),
        (col("e_within") + col("e_cross")).as("n_edges"),
        (col("t_within") + col("t_mixed") + col("t_rep")).as("n_triangles"),
        expr("3 * (t_within + t_mixed + t_rep) * 10000 DIV greatest(wedges, 1)")
          .as("gcc_bp"))
  }

  /** Integer EWMA over per-type hourly event counts — the recursive
    * smoother an alerting baseline runs (α = 1/8, the classic
    * power-of-two choice): s₀ = c₀·2^20, sₜ = (7·sₜ₋₁ + cₜ·2^20) DIV 8.
    * Integer floor division makes every step exact in both engines —
    * recursion order is pinned by sorting hours, and the fold is a
    * strict sequential `aggregate` HOF / `list_reduce` (the
    * q_bpe_learn parity pattern for inherently-sequential state).
    * SCALE: one hour-keyed count (map-side combine), then the fold
    * runs per type over a HORIZON-bounded array (hours, not events) —
    * the recursion never touches corpus-sized data.
    */
  val ewma: QueryDef = QueryDef.sql(
    "q_ewma",
    """WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
      |           FROM events GROUP BY 1, 2),
      |arr AS (SELECT event_type, list(c ORDER BY h) AS cs, count(*) AS nh
      |        FROM hc GROUP BY 1)
      |SELECT event_type, CAST(nh AS BIGINT) AS n_hours,
      |       CAST(cs[len(cs)] AS BIGINT) AS last_cnt,
      |       CAST(list_reduce(list_prepend(CAST(cs[1] * 1048576 AS BIGINT), cs[2:]),
      |                        (acc, c) -> (acc * 7 + c * 1048576) // 8) AS BIGINT)
      |         AS ewma_q20
      |FROM arr""".stripMargin) { (spark, dir) =>
    val hc = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    hc.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("h"), col("c")))).as("hs"))
      .select(col("event_type"), expr("transform(hs, x -> x.c)").as("cs"))
      .select(col("event_type"),
        size(col("cs")).cast("long").as("n_hours"),
        expr("cs[size(cs) - 1]").as("last_cnt"),
        expr("aggregate(slice(cs, 2, size(cs) - 1), cs[0] * CAST(1048576 AS BIGINT)," +
          " (acc, c) -> (acc * 7 + c * 1048576) DIV 8)").as("ewma_q20"))
  }

  /** DEDUP COST REPORT — what each tier would delete under the
    * min-id-keeper rule, in documents, tokens, and token share (bp):
    * exact (same text), near (shingle Jaccard ≥ 0.5), containment
    * (≥ 0.8). The three drop sets ride the SAME df-capped shingle
    * pair stream (`Dedup.ngramJaccardPairs` at threshold 0, scored
    * both ways), so the report costs one pair pass + three
    * broadcast-sized joins against per-doc token counts — the
    * storage-owner view of the whole dedup family.
    */
  val dedupCost: QueryDef = QueryDef.sql(
    "q_dedup_cost",
    s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql("string_split(text, ' ')", 3)}) AS s
       |            FROM documents),
       |hs AS (SELECT DISTINCT doc_id, ${polyHashSql("s")} AS h FROM sh),
       |kept AS (SELECT h FROM hs GROUP BY h HAVING count(*) <= 64),
       |hsk AS (SELECT hs.doc_id, hs.h FROM hs JOIN kept ON kept.h = hs.h),
       |cardk AS (SELECT doc_id, count(*) AS c FROM hsk GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
       |          FROM hsk a JOIN hsk b ON a.h = b.h AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |jp AS (SELECT i.ida, i.idb,
       |              CAST(i.i AS DOUBLE) / (ca.c + cb.c - i.i) AS j,
       |              CAST(i.i AS DOUBLE) / least(ca.c, cb.c) AS cont
       |       FROM inter i JOIN cardk ca ON ca.doc_id = i.ida
       |                    JOIN cardk cb ON cb.doc_id = i.idb),
       |tok AS (SELECT doc_id, len(string_split(text, ' ')) AS nt FROM documents),
       |tot AS (SELECT CAST(sum(nt) AS BIGINT) AS t FROM tok),
       |exact_drop AS (SELECT d.doc_id FROM documents d
       |               JOIN (SELECT text, min(doc_id) AS m FROM documents GROUP BY text) k
       |                 ON k.text = d.text WHERE d.doc_id > k.m),
       |near_drop AS (SELECT DISTINCT idb AS doc_id FROM jp WHERE j >= 0.5),
       |cont_drop AS (SELECT DISTINCT idb AS doc_id FROM jp WHERE cont >= 0.8),
       |tiers AS (SELECT 'exact' AS tier, doc_id FROM exact_drop
       |          UNION ALL SELECT 'near_jaccard', doc_id FROM near_drop
       |          UNION ALL SELECT 'containment', doc_id FROM cont_drop)
       |SELECT t.tier, CAST(count(*) AS BIGINT) AS n_dropped,
       |       CAST(sum(tok.nt) AS BIGINT) AS tokens_dropped,
       |       CAST((sum(tok.nt) * 10000) // max(tot.t) AS BIGINT) AS token_share_bp
       |FROM tiers t JOIN tok USING (doc_id), tot
       |GROUP BY t.tier""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    val jp = Dedup.ngramJaccardPairs(hs, "doc_id", 0.0)
      .withColumn("cont", col("i").cast("double") / least(col("ca"), col("cb")))
    val tok = docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("nt"))
    val tot = tok.agg(sum("nt").cast("long").as("t"))
    // exact tier: ONE narrow shuffle — window over the content key on a
    // (doc_id, ck) frame. The previous text-keyed group + text-keyed
    // join moved the full corpus text through two exchanges and was the
    // whale in this query's third-decade probe (decade 1.36).
    val exactDrop = docs
      .select(col("doc_id"), Dedup.contentKey(col("text")).as("ck"))
      .withColumn("m", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("ck")))
      .filter(col("doc_id") > col("m")).select(col("doc_id"))
    // ONE pass over the pair stream for both similarity tiers: fold the
    // two thresholds into per-doc flags (map-side partial max), then
    // checkpoint the doc-bounded flag table — without this, near and
    // containment each re-ran the whole shingle pair pipeline
    val flags = jp
      .groupBy(col("idb").as("doc_id"))
      .agg(max(when(col("jaccard") >= 0.5, 1).otherwise(0)).as("near"),
        max(when(col("cont") >= 0.8, 1).otherwise(0)).as("cnt"))
      .localCheckpoint()
    val nearDrop = flags.filter(col("near") === 1).select(col("doc_id"))
    val contDrop = flags.filter(col("cnt") === 1).select(col("doc_id"))
    val tiers = exactDrop.withColumn("tier", lit("exact"))
      .unionAll(nearDrop.withColumn("tier", lit("near_jaccard")))
      .unionAll(contDrop.withColumn("tier", lit("containment")))
    tiers.join(tok, "doc_id").crossJoin(broadcast(tot))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_dropped"),
        sum("nt").cast("long").as("tokens_dropped"),
        expr("CAST(sum(nt) * 10000 DIV max(t) AS BIGINT)").as("token_share_bp"))
  }

  /** Language-ID CONFUSION MATRIX — the eval for `q_lang_id`'s marker
    * heuristic: per (labeled, predicted) counts plus per-label recall
    * in basis points. Composes the existing query (same Spark fn, same
    * oracle SQL as a subquery), so classifier and eval can never
    * drift apart. SCALE: a (langs × langs)-bounded aggregate over the
    * classifier's map-side output.
    */
  val langidConfusion: QueryDef = QueryDef.sql(
    "q_langid_confusion",
    s"""WITH pred AS (${TextStatsQueries.langId.oracle.get}),
       |cm AS (SELECT labeled_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |       FROM pred GROUP BY 1, 2),
       |lt AS (SELECT labeled_lang, CAST(sum(n) AS BIGINT) AS lab_total FROM cm GROUP BY 1)
       |SELECT cm.labeled_lang, cm.pred_lang, cm.n,
       |       CAST((cm.n * 10000) // lt.lab_total AS BIGINT) AS recall_bp
       |FROM cm JOIN lt USING (labeled_lang)""".stripMargin) { (spark, dir) =>
    val pred = TextStatsQueries.langId.fn(spark, dir)
    val cm = pred.groupBy("labeled_lang", "pred_lang").agg(count(lit(1)).as("n"))
    val lt = cm.groupBy("labeled_lang").agg(sum("n").cast("long").as("lab_total"))
    cm.join(broadcast(lt), "labeled_lang")
      .select(col("labeled_lang"), col("pred_lang"), col("n"),
        expr("n * 10000 DIV lab_total").as("recall_bp"))
  }

  val all: Seq[QueryDef] = Seq(triangleCount, ewma, dedupCost, langidConfusion)
}
