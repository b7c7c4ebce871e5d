package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.Dedup

/** Fourteenth curation batch: the Hilbert-curve layout planner (the
  * locality upgrade over `q_zorder_layout` — same zone-map pricing,
  * better curve), interpolated Kneser–Ney bigram smoothing (the LM
  *-smoothing standard, in exact integer Q20 so both engines agree
  * bit-for-bit), the cross-SOURCE near-dup matrix (which source pairs
  * share templates — the dedup-priority view a corpus owner triages
  * by), and the type-token-ratio curve (lexical diversity vs length —
  * the Heaps-law calibration for length-normalized quality filters).
  */
object CurationQueries14 {

  /** One Hilbert xy→d fold step (the classic quadrant-rotation
    * algorithm, grid 256×256): emitted as engine-neutral SQL. The
    * `(3·rx) XOR ry` quadrant index is folded into a CASE table
    * (0,1,3,2) so no engine-specific xor syntax is needed, and each
    * step writes freshly-numbered columns (x1,y1,d1 …) so lateral
    * column aliasing can never rebind a reference to the new value.
    */
  private def hilbertStep(i: Int): (String, String, String) = {
    val s = 128 >> i
    val (px, py, pd) = (s"x$i", s"y$i", s"d$i")
    val rx = s"(($px & $s) > 0)"
    val ry = s"(($py & $s) > 0)"
    val x = s"CASE WHEN $ry THEN $px ELSE CASE WHEN $rx THEN 255 - $py ELSE $py END END AS x${i + 1}"
    val y = s"CASE WHEN $ry THEN $py ELSE CASE WHEN $rx THEN 255 - $px ELSE $px END END AS y${i + 1}"
    val d = s"$pd + ${s * s} * (CASE WHEN $ry THEN (CASE WHEN $rx THEN 2 ELSE 1 END)" +
      s" ELSE (CASE WHEN $rx THEN 3 ELSE 0 END) END) AS d${i + 1}"
    (x, y, d)
  }

  /** The full 8-step chain as SQL CTEs `h0..h8` over a source CTE with
    * grid columns (xq, yq); `h8.d8` is the 16-bit Hilbert key.
    */
  private def hilbertCtes(from: String): String = {
    val steps = (0 until 8).map { i =>
      val (x, y, d) = hilbertStep(i)
      s"h${i + 1} AS (SELECT xq, yq, $x, $y, $d FROM h$i)"
    }
    (s"h0 AS (SELECT xq, yq, xq AS x0, yq AS y0, CAST(0 AS BIGINT) AS d0 FROM $from)" +:
      steps).mkString(",\n")
  }

  /** HILBERT-CURVE LAYOUT PLANNER — `q_zorder_layout`'s question asked
    * one curve up: the same 256×256 (partkey, suppkey) grid, split into
    * 100 files by curve-key range, priced against per-file min/max zone
    * maps for a HILBERT-key split vs the Morton split under 8 width-32
    * single-dimension probes. The file count is deliberately NOT a
    * power of two: under an aligned 64-file split both curves tile the
    * grid into identical 32×32 blocks and prune identically (verified —
    * the comparison is degenerate), but real file splits are sized by
    * bytes, not bit boundaries, and there Hilbert's continuity pays —
    * every contiguous key run is a CONNECTED region of diameter
    * ~sqrt(run), while a Morton run can jump diagonally across half the
    * grid, inflating the file's bounding box and its probe hit rate
    * (measured on the full grid: 131 vs 148 file-probe hits — why
    * Hilbert replaced Z-order in recent lakehouse layout engines). The
    * xy→d fold is the classic quadrant-rotation recurrence, unrolled
    * into 8 pure integer CASE steps that are the SAME SQL text on both
    * engines (no xor, no floats, no lateral aliasing).
    *
    * SCALE: the fold is 8 chained map-side projections that Catalyst
    * collapses into one codegen'd Project (no Exchange until the
    * 100-row zone-map aggregate); probe pricing is broadcast-sized.
    * Like the Z-order planner, this costs one scan + two 100-key
    * aggregates at any corpus size.
    */
  val hilbertLayout: QueryDef = QueryDef.sql(
    "q_hilbert_layout",
    s"""WITH ext AS (SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
       |                   min(l_suppkey) AS mins, max(l_suppkey) AS maxs
       |            FROM lineitem),
       |g AS (SELECT ((l_partkey - minp) * 255) // greatest(maxp - minp, 1) AS xq,
       |             ((l_suppkey - mins) * 255) // greatest(maxs - mins, 1) AS yq
       |      FROM lineitem, ext),
       |${hilbertCtes("g")},
       |z AS (SELECT xq, yq, ${CurationQueries8.mortonDuck("xq", "yq")} AS zkey FROM g),
       |hf AS (SELECT (d8 * 100) // 65536 AS f, min(xq) AS minx, max(xq) AS maxx,
       |              min(yq) AS miny, max(yq) AS maxy
       |       FROM h8 GROUP BY 1),
       |zf AS (SELECT (zkey * 100) // 65536 AS f, min(xq) AS minx, max(xq) AS maxx,
       |              min(yq) AS miny, max(yq) AS maxy
       |       FROM z GROUP BY 1),
       |probes(probe_id, dim, lo, hi) AS (
       |  SELECT * FROM (VALUES (0,'part',0,31), (1,'part',64,95),
       |                        (2,'part',128,159), (3,'part',192,223),
       |                        (4,'supp',0,31), (5,'supp',64,95),
       |                        (6,'supp',128,159), (7,'supp',192,223))),
       |hh AS (SELECT p.probe_id, count(*) AS files_h
       |       FROM probes p JOIN hf
       |         ON (p.dim = 'part' AND hf.maxx >= p.lo AND hf.minx <= p.hi)
       |         OR (p.dim = 'supp' AND hf.maxy >= p.lo AND hf.miny <= p.hi)
       |       GROUP BY 1),
       |hz AS (SELECT p.probe_id, count(*) AS files_z
       |       FROM probes p JOIN zf
       |         ON (p.dim = 'part' AND zf.maxx >= p.lo AND zf.minx <= p.hi)
       |         OR (p.dim = 'supp' AND zf.maxy >= p.lo AND zf.miny <= p.hi)
       |       GROUP BY 1)
       |SELECT CAST(p.probe_id AS BIGINT) AS probe_id, p.dim,
       |       CAST(p.lo AS BIGINT) AS lo, CAST(p.hi AS BIGINT) AS hi,
       |       CAST(coalesce(hh.files_h, 0) AS BIGINT) AS files_h,
       |       CAST(coalesce(hz.files_z, 0) AS BIGINT) AS files_z
       |FROM probes p LEFT JOIN hh USING (probe_id)
       |     LEFT JOIN hz USING (probe_id)""".stripMargin) { (spark, dir) =>
    val li = Tables(spark, dir, "lineitem").select("l_partkey", "l_suppkey")
    val ext = li.agg(
      min("l_partkey").as("minp"), max("l_partkey").as("maxp"),
      min("l_suppkey").as("mins"), max("l_suppkey").as("maxs"))
    val g = li.crossJoin(broadcast(ext)).select(
      expr("((l_partkey - minp) * 255) DIV greatest(maxp - minp, 1)").as("xq"),
      expr("((l_suppkey - mins) * 255) DIV greatest(maxs - mins, 1)").as("yq"))
    // the 8 fold steps as chained projections — Catalyst collapses them
    // into one codegen'd Project, so the whole curve costs zero jobs
    val h = (0 until 8).foldLeft(
      g.selectExpr("xq", "yq", "xq AS x0", "yq AS y0", "CAST(0 AS BIGINT) AS d0")) {
      case (df, i) =>
        val (x, y, d) = hilbertStep(i)
        df.selectExpr("xq", "yq", x, y, d)
    }
    val z = g.withColumn("zkey", expr(CurationQueries8.mortonSpark("xq", "yq")))
    def zoneMap(df: DataFrame, fileKey: String) =
      df.groupBy(expr(fileKey).as("f"))
        .agg(min("xq").as("minx"), max("xq").as("maxx"),
          min("yq").as("miny"), max("yq").as("maxy"))
    val hf = zoneMap(h, "(d8 * 100) DIV 65536")
    val zf = zoneMap(z, "(zkey * 100) DIV 65536")
    import spark.implicits._
    val probes = Seq(
      (0, "part", 0, 31), (1, "part", 64, 95), (2, "part", 128, 159),
      (3, "part", 192, 223), (4, "supp", 0, 31), (5, "supp", 64, 95),
      (6, "supp", 128, 159), (7, "supp", 192, 223))
      .toDF("probe_id", "dim", "lo", "hi")
    def overlap(zm: DataFrame, out: String) =
      broadcast(probes).join(zm,
          (col("dim") === "part" && col("maxx") >= col("lo") && col("minx") <= col("hi")) ||
          (col("dim") === "supp" && col("maxy") >= col("lo") && col("miny") <= col("hi")))
        .groupBy("probe_id").agg(count(lit(1)).as(out))
    probes
      .join(overlap(hf, "files_h"), Seq("probe_id"), "left")
      .join(overlap(zf, "files_z"), Seq("probe_id"), "left")
      .select(col("probe_id").cast("long"), col("dim"),
        col("lo").cast("long"), col("hi").cast("long"),
        coalesce(col("files_h"), lit(0)).cast("long").as("files_h"),
        coalesce(col("files_z"), lit(0)).cast("long").as("files_z"))
  }

  /** INTERPOLATED KNESER–NEY bigram smoothing — the LM-smoothing
    * standard (Kneser & Ney 1995; Chen & Goodman 1998): with absolute
    * discount D = 3/4,
    *   P(w2|w1) = max(c12 − D, 0)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/T
    * where N1+(w1·) is the follower-type count, N1+(·w2) the
    * CONTINUATION count (how many distinct contexts w2 appears in — the
    * insight that "Francisco" is frequent but not versatile), and T the
    * total bigram-type count. With D = 3/4 every term is rational, so
    * the whole model is computed in exact integer Q20:
    * max(c12−3/4,0)/c1 = (4·c12−3)/(4·c1) for observed bigrams. Output:
    * the 30 most-frequent bigrams with their smoothed probability and
    * both interpolation parts — the table you sanity-check a smoother
    * with (λ high for promiscuous contexts, P_cont low for
    * context-locked words).
    *
    * SCALE: bigram emission is map-side (one shuffle to count types);
    * all four statistics are map-side-combinable aggregates of the
    * TYPE table (vocab², not corpus, sized); T is a 1-row broadcast;
    * top-30 is TakeOrderedAndProject. Nothing corpus-shaped survives
    * past the first count.
    */
  val kneserNey: QueryDef = QueryDef.sql(
    "q_kneser_ney",
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (SELECT toks[i] AS w1, toks[i+1] AS w2
      |       FROM tk, unnest(range(1, len(toks))) t(i)),
      |cb AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      |cu AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
      |              count(*) AS n1f FROM cb GROUP BY 1),
      |cont AS (SELECT w2, count(*) AS n1b FROM cb GROUP BY 1),
      |t AS (SELECT count(*) AS tt FROM cb),
      |q AS (SELECT cb.w1, cb.w2, cb.c12,
      |             ((4 * cb.c12 - 3) * 1048576) // (4 * cu.c1) AS pml_q20,
      |             (3 * cu.n1f * 1048576) // (4 * cu.c1) AS lambda_q20,
      |             (cont.n1b * 1048576) // max(t.tt) OVER () AS pcont_q20
      |      FROM cb JOIN cu USING (w1) JOIN cont USING (w2), t)
      |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
      |       CAST(pml_q20 + (lambda_q20 * pcont_q20) // 1048576 AS BIGINT) AS pkn_q20,
      |       CAST(lambda_q20 AS BIGINT) AS lambda_q20,
      |       CAST(pcont_q20 AS BIGINT) AS pcont_q20
      |FROM q ORDER BY c12 DESC, w1, w2 LIMIT 30""".stripMargin) { (spark, dir) =>
    val toks = col("toks")
    val bg = Tables(spark, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(explode(transform(
        sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // follower-type and continuation counts both derive from the TYPE
    // table, never re-touching the corpus-sized bigram stream
    val cu = cb.groupBy("w1")
      .agg(sum("c12").cast("long").as("c1"), count(lit(1)).as("n1f"))
    val cont = cb.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val t = cb.agg(count(lit(1)).as("tt"))
    cb.join(cu, "w1").join(cont, "w2").crossJoin(broadcast(t))
      .select(col("w1"), col("w2"), col("c12"),
        expr("((4 * c12 - 3) * 1048576) DIV (4 * c1)").as("pml_q20"),
        expr("(3 * n1f * 1048576) DIV (4 * c1)").as("lambda_q20"),
        expr("(n1b * 1048576) DIV tt").as("pcont_q20"))
      .select(col("w1"), col("w2"), col("c12").cast("long").as("c12"),
        expr("CAST(pml_q20 + (lambda_q20 * pcont_q20) DIV 1048576 AS BIGINT)").as("pkn_q20"),
        col("lambda_q20").cast("long").as("lambda_q20"),
        col("pcont_q20").cast("long").as("pcont_q20"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(30)
  }

  /** CROSS-SOURCE NEAR-DUP MATRIX — the SimHash near-dup pair stream
    * (hamming ≤ 1, the `q_simhash_pairs` edge set — the 60-bit
    * dual-family signature since round 10, so source triage inherits
    * the corpus-scale band keyspace instead of the flooding 30-bit
    * graph) aggregated by the
    * SOURCE pair it connects, with each cell's share of total pair mass
    * in basis points. The triage view for dedup priority: a heavy
    * diagonal cell says a source duplicates ITSELF (template boilerplate
    * — collapse within source); a heavy off-diagonal says two sources
    * mirror each other (cross-source syndication — dedup must run
    * globally, not per-source). SCALE: the pair stream joins the
    * doc→source map twice (corpus-sized shuffles, same bound as the
    * pair generator), then everything is a |sources|²-row aggregate;
    * the total re-derives from the matrix, never re-touching pairs.
    */
  val sourceDupMatrix: QueryDef = QueryDef.sql(
    "q_source_dup_matrix",
    s"""WITH ${DedupQueries.SimhashWideCte},
       |${DedupQueries.SimhashWideEdgeCte},
       |lab AS (SELECT doc_id, source FROM documents),
       |m AS (SELECT least(la.source, lb.source) AS src_a,
       |             greatest(la.source, lb.source) AS src_b, count(*) AS n
       |      FROM e JOIN lab la ON la.doc_id = e.ida
       |             JOIN lab lb ON lb.doc_id = e.idb
       |      GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM m)
       |SELECT src_a, src_b, CAST(n AS BIGINT) AS n_pairs,
       |       CAST((n * 10000) // t AS BIGINT) AS pair_share_bp
       |FROM m, tot""".stripMargin) { (spark, dir) =>
    // WEIGHTED-REPRESENTATIVE REWRITE (round 11): the raw band join
    // enumerates every member pair, which is Θ(cluster²) on a
    // mega-duplicate cluster BY CONSTRUCTION — but this query's OUTPUT
    // is only a |sources|²-row matrix, and exact duplicates make the
    // pair counts pure ALGEBRA: byte-identical docs have identical
    // signatures (the simhash kernel is a function of the text), so
    // (a) every within-cluster member pair is a hamming-0 near-dup —
    //     count C(n,2) per (cluster, source) and n_s1·n_s2 across the
    //     cluster's source split, never enumerating members; and
    // (b) two clusters' members either ALL pair or NONE do (band match
    //     + hamming threshold depend only on the two signatures), so
    //     cross-cluster counts are rep-pair × n_a(src)·n_b(src).
    // Identical output to the raw enumeration (the unchanged DuckDB
    // oracle checks exactly that), but pair generation runs over
    // DISTINCT TEXTS: the mega-dup adversary collapses to one rep
    // before any band join. The signature rides the collapse exchange
    // as a LONG next to the narrow content key (min over identical
    // values — exact), so raw text never shuffles. NEITHER side of the
    // weight joins is hint-broadcast (round 12): the rep-pair stream is
    // edge-sized but adversary-unbounded, and the weight table is
    // Θ(texts) — on a low-duplication corpus that is Θ(docs), which
    // blows Spark's 8 GB broadcast cap at 100 TB. Both joins are plain
    // rid equi-joins over localCheckpoint'ed inputs, so AQE sees exact
    // sizes at runtime: it broadcasts whichever side is actually small
    // (sandbox: the weight table) and degrades to a shuffled join —
    // Θ(edges + texts) — when neither is. The only FORCED broadcasts
    // left are 1-row global aggregates (PlanShapeSpec gates this).
    val docs = Tables(spark, dir, "documents")
    val base = docs.select(col("doc_id"), col("source"),
      Dedup.contentKey(col("text")).as("ck"),
      graft.functions.HashExpressions
        .simhashDualFast(graft.functions.TextFunctions.tokens(col("text"))).as("simhash"))
    // one cluster row per distinct text: id + signature (both exact
    // mins over identical values), plus the per-(cluster, source)
    // member counts that weight the algebra
    val cl = base.groupBy("ck")
      .agg(min(col("doc_id")).as("rid"), min(col("simhash")).as("simhash"))
    val cs = base.groupBy("ck", "source").agg(count(lit(1)).as("n"))
      .join(cl.select(col("ck"), col("rid")), "ck")
      .select(col("rid"), col("source"), col("n"))
      // Θ(texts × sources) weight table, read 4x below. DURABILITY:
      // lineage-severed; default executor-local (fast, non-replicated),
      // preemptible clusters flip spark.graft.reliableCheckpoint — same
      // plan shape, pinned by DurabilitySpec.
      .transform(graft.Durability.stage)
    // (b) cross-cluster: band-join the DISTINCT-text signatures only
    val e = Dedup.simhashPairs(cl.select(col("rid"), col("simhash")), "rid", 1, bandBits = 30)
      .select("ida", "idb")
    val cross = e
      .join(cs.select(col("rid").as("ida"), col("source").as("sa"), col("n").as("na")), "ida")
      .join(cs.select(col("rid").as("idb"), col("source").as("sb"), col("n").as("nb")), "idb")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"),
        (col("na") * col("nb")).as("w"))
    // (a) within-cluster: same-source C(n,2) + cross-source n·m cells
    val same = cs.filter(col("n") >= 2)
      .select(col("source").as("src_a"), col("source").as("src_b"),
        expr("n * (n - 1) DIV 2").as("w"))
    val diff = cs.select(col("rid"), col("source").as("sa"), col("n").as("na"))
      .join(cs.select(col("rid"), col("source").as("sb"), col("n").as("nb")), "rid")
      .filter(col("sa") < col("sb"))
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        (col("na") * col("nb")).as("w"))
    val m = cross.unionByName(same).unionByName(diff)
      .groupBy("src_a", "src_b").agg(sum("w").as("n"))
      // sources²-row matrix feeds both the total and the output
      .transform(graft.Durability.stage)
    val tot = m.agg(sum("n").cast("long").as("t"))
    m.crossJoin(broadcast(tot))
      .select(col("src_a"), col("src_b"), col("n").cast("long").as("n_pairs"),
        expr("(n * 10000) DIV t").as("pair_share_bp"))
  }

  /** TYPE-TOKEN-RATIO CURVE — lexical diversity vs document length:
    * docs bucketed by token count (64-token steps, capped at bucket 7),
    * each bucket reporting pooled TTR (Σdistinct/Σtokens) plus the
    * per-doc min/max, all in integer basis points. TTR falls with
    * length by Heaps' law, so a single corpus-wide TTR threshold
    * silently filters long documents — this curve is the calibration
    * that makes a diversity filter length-aware (compare each doc to
    * its OWN bucket, the `q_length_buckets` idiom one signal deeper).
    * SCALE: per-doc distinct counts are map-side array ops (no explode,
    * no shuffle); the only exchange carries 8 bucket rows.
    */
  val ttrCurve: QueryDef = QueryDef.sql(
    "q_ttr_curve",
    """WITH s AS (SELECT len(string_split(text, ' ')) AS nt,
      |                 len(list_distinct(string_split(text, ' '))) AS nd
      |           FROM documents)
      |SELECT CAST(least(nt // 64, 7) AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(nt) AS BIGINT) AS n_tokens,
      |       CAST((sum(nd) * 10000) // sum(nt) AS BIGINT) AS ttr_bp,
      |       CAST(min((nd * 10000) // nt) AS BIGINT) AS ttr_min_bp,
      |       CAST(max((nd * 10000) // nt) AS BIGINT) AS ttr_max_bp
      |FROM s GROUP BY 1""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(size(col("toks")).cast("long").as("nt"),
        size(array_distinct(col("toks"))).cast("long").as("nd"))
    s.groupBy(least(expr("nt DIV 64"), lit(7L)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum("nt").cast("long").as("n_tokens"),
        expr("CAST(sum(nd) * 10000 DIV sum(nt) AS BIGINT)").as("ttr_bp"),
        min(expr("(nd * 10000) DIV nt")).cast("long").as("ttr_min_bp"),
        max(expr("(nd * 10000) DIV nt")).cast("long").as("ttr_max_bp"))
  }

  val all: Seq[QueryDef] = Seq(hilbertLayout, kneserNey, sourceDupMatrix, ttrCurve)
}
