package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHashSql, tokens}

/** Eighth curation batch: physical data-layout planning (Z-order
  * clustering with a min/max pruning-benefit report — the OPTIMIZE
  * ZORDER decision a 100 TB table owner makes before anything else)
  * and cross-document maximal repeated-span mining (the exact-substring
  * dedup shape: duplicated fixed-width fingerprints merged into maximal
  * islands). Determinism discipline unchanged: pure integer bit
  * arithmetic for the space-filling curve, integer positions for spans.
  */
object CurationQueries8 {

  /** Bit-interleave of two 8-bit grid coordinates into a 16-bit Morton
    * (Z-order) key, emitted as engine-specific SQL. Pure integral bit
    * algebra — identical on both engines by construction.
    */
  private[queries] def mortonDuck(x: String, y: String): String =
    (0 until 8).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  private[queries] def mortonSpark(x: String, y: String): String =
    (0 until 8).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")

  /** Z-ORDER LAYOUT PLANNER — the data-layout decision itself as a
    * query. lineitem rows are normalized onto a 256×256 (partkey,
    * suppkey) grid, assigned to 64 files two ways — a Morton-key range
    * split (Z-order, `zkey DIV 1024`) and a single-column lexicographic
    * sort split (`xq DIV 4`) — and 8 single-dimension range probes (4
    * per dimension) are priced against each layout's per-file min/max
    * zone maps: a file is "hit" when its [min,max] envelope on the
    * probed dimension overlaps the probe range. The report shows the
    * classic trade: the lex layout prunes partkey probes perfectly and
    * suppkey probes not at all (all 64 files hit), while Z-order prunes
    * BOTH dimensions to ~sqrt coverage — why multi-predicate workloads
    * Z-order their tables.
    *
    * SCALE: grid coordinates and Morton keys are map-side integral
    * arithmetic over a broadcast 1-row extent; each layout's zone map is
    * a 64-row aggregate; probe pricing joins 8×64 broadcast-sized
    * tables. The only corpus-shaped work is one scan + two 64-key
    * aggregates — the planner costs (almost) nothing at any scale,
    * which is exactly why zone-map pruning reports are run fleet-wide.
    */
  val zorderLayout: QueryDef = QueryDef.sql(
    "q_zorder_layout",
    s"""WITH ext AS (SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
       |                   min(l_suppkey) AS mins, max(l_suppkey) AS maxs
       |            FROM lineitem),
       |g AS (SELECT ((l_partkey - minp) * 255) // greatest(maxp - minp, 1) AS xq,
       |             ((l_suppkey - mins) * 255) // greatest(maxs - mins, 1) AS yq
       |      FROM lineitem, ext),
       |z AS (SELECT xq, yq, ${mortonDuck("xq", "yq")} AS zkey FROM g),
       |zf AS (SELECT zkey // 1024 AS f, min(xq) AS minx, max(xq) AS maxx,
       |              min(yq) AS miny, max(yq) AS maxy
       |       FROM z GROUP BY 1),
       |lf AS (SELECT xq // 4 AS f, min(xq) AS minx, max(xq) AS maxx,
       |              min(yq) AS miny, max(yq) AS maxy
       |       FROM g GROUP BY 1),
       |probes(probe_id, dim, lo, hi) AS (
       |  SELECT * FROM (VALUES (0,'part',0,63), (1,'part',64,127),
       |                        (2,'part',128,191), (3,'part',192,255),
       |                        (4,'supp',0,63), (5,'supp',64,127),
       |                        (6,'supp',128,191), (7,'supp',192,255))),
       |hz AS (SELECT p.probe_id, count(*) AS files_z
       |       FROM probes p JOIN zf
       |         ON (p.dim = 'part' AND zf.maxx >= p.lo AND zf.minx <= p.hi)
       |         OR (p.dim = 'supp' AND zf.maxy >= p.lo AND zf.miny <= p.hi)
       |       GROUP BY 1),
       |hl AS (SELECT p.probe_id, count(*) AS files_lex
       |       FROM probes p JOIN lf
       |         ON (p.dim = 'part' AND lf.maxx >= p.lo AND lf.minx <= p.hi)
       |         OR (p.dim = 'supp' AND lf.maxy >= p.lo AND lf.miny <= p.hi)
       |       GROUP BY 1),
       |rh AS (SELECT p.probe_id, count(*) AS rows_hit
       |       FROM probes p JOIN g
       |         ON (p.dim = 'part' AND g.xq BETWEEN p.lo AND p.hi)
       |         OR (p.dim = 'supp' AND g.yq BETWEEN p.lo AND p.hi)
       |       GROUP BY 1)
       |SELECT CAST(p.probe_id AS BIGINT) AS probe_id, p.dim,
       |       CAST(p.lo AS BIGINT) AS lo, CAST(p.hi AS BIGINT) AS hi,
       |       CAST(coalesce(hz.files_z, 0) AS BIGINT) AS files_z,
       |       CAST(coalesce(hl.files_lex, 0) AS BIGINT) AS files_lex,
       |       CAST(coalesce(rh.rows_hit, 0) AS BIGINT) AS rows_hit
       |FROM probes p LEFT JOIN hz USING (probe_id)
       |     LEFT JOIN hl USING (probe_id) LEFT JOIN rh USING (probe_id)""".stripMargin) {
    (spark, dir) =>
      val li = Tables(spark, dir, "lineitem").select("l_partkey", "l_suppkey")
      val ext = li.agg(
        min("l_partkey").as("minp"), max("l_partkey").as("maxp"),
        min("l_suppkey").as("mins"), max("l_suppkey").as("maxs"))
      val g = li.crossJoin(broadcast(ext)).select(
        expr("((l_partkey - minp) * 255) DIV greatest(maxp - minp, 1)").as("xq"),
        expr("((l_suppkey - mins) * 255) DIV greatest(maxs - mins, 1)").as("yq"))
      val z = g.withColumn("zkey", expr(mortonSpark("xq", "yq")))
      def zoneMap(df: org.apache.spark.sql.DataFrame, fileKey: String) =
        df.groupBy(expr(fileKey).as("f"))
          .agg(min("xq").as("minx"), max("xq").as("maxx"),
            min("yq").as("miny"), max("yq").as("maxy"))
      val zf = zoneMap(z, "zkey DIV 1024")
      val lf = zoneMap(g, "xq DIV 4")
      import spark.implicits._
      val probes = Seq(
        (0, "part", 0, 63), (1, "part", 64, 127), (2, "part", 128, 191),
        (3, "part", 192, 255), (4, "supp", 0, 63), (5, "supp", 64, 127),
        (6, "supp", 128, 191), (7, "supp", 192, 255))
        .toDF("probe_id", "dim", "lo", "hi")
      def overlap(zm: org.apache.spark.sql.DataFrame, out: String) =
        broadcast(probes).join(zm,
            (col("dim") === "part" && col("maxx") >= col("lo") && col("minx") <= col("hi")) ||
            (col("dim") === "supp" && col("maxy") >= col("lo") && col("miny") <= col("hi")))
          .groupBy("probe_id").agg(count(lit(1)).as(out))
      val hz = overlap(zf, "files_z")
      val hl = overlap(lf, "files_lex")
      // rows_hit: 8-row probe table broadcast against the scan, map-side
      val rh = g.join(broadcast(probes),
          (col("dim") === "part" && col("xq").between(col("lo"), col("hi"))) ||
          (col("dim") === "supp" && col("yq").between(col("lo"), col("hi"))))
        .groupBy("probe_id").agg(count(lit(1)).as("rows_hit"))
      probes
        .join(hz, Seq("probe_id"), "left")
        .join(hl, Seq("probe_id"), "left")
        .join(rh, Seq("probe_id"), "left")
        .select(col("probe_id").cast("long").as("probe_id"), col("dim"),
          col("lo").cast("long").as("lo"), col("hi").cast("long").as("hi"),
          coalesce(col("files_z"), lit(0L)).as("files_z"),
          coalesce(col("files_lex"), lit(0L)).as("files_lex"),
          coalesce(col("rows_hit"), lit(0L)).as("rows_hit"))
  }

  /** MAXIMAL CROSS-DOCUMENT REPEATED SPANS — the exact-substring dedup
    * shape (suffix-array dedup's distributed stand-in): every 8-token
    * window (stride 1) is fingerprinted; windows whose fingerprint
    * occurs in ≥2 DISTINCT documents mark their start position
    * duplicated; consecutive duplicated positions merge into maximal
    * islands via the gaps-and-islands idiom (`p - row_number()` within
    * the document — a PARTITIONED window, never corpus-global); each
    * island is a maximal repeated span [min p, max p + 7]. Output: the
    * corpus's top-20 longest spans, heap-selected.
    *
    * SCALE: one window row per token position (corpus-linear ×1), one
    * fingerprint-keyed aggregate + semi-join, and per-document windows;
    * the top-20 is `TakeOrderedAndProject`. No step is quadratic in
    * corpus or document length.
    */
  val repeatedSpans: QueryDef = QueryDef.sql(
    "q_repeated_spans",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents WHERE len(string_split(text, ' ')) >= 8),
       |w AS (SELECT doc_id, p,
       |             ${polyHashSql("array_to_string(toks[p : p + 7], ' ')")} AS fp
       |      FROM tk, unnest(range(1, len(toks) - 6)) t(p)),
       |b AS (SELECT fp FROM w GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
       |d AS (SELECT w.doc_id, w.p FROM w JOIN b USING (fp)),
       |isl AS (SELECT doc_id, p,
       |               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |        FROM d),
       |sp AS (SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
       |              CAST(max(p) - min(p) + 8 AS BIGINT) AS span_len
       |       FROM isl GROUP BY doc_id, grp),
       |top AS (SELECT * FROM sp ORDER BY span_len DESC, doc_id, span_start LIMIT 20)
       |SELECT CAST(row_number() OVER (ORDER BY span_len DESC, doc_id, span_start) AS BIGINT) AS rank,
       |       doc_id, span_start, span_len
       |FROM top""".stripMargin) { (spark, dir) =>
    val tk = Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
    // All window fingerprints come from one codegen kernel pass per doc:
    // a rolling prefix-hash fold over the space-joined text makes every
    // window hash O(1) after an O(chars) precompute — no window strings,
    // no O(n·chars) refolding. The two consumers below recompute this
    // map-side projection rather than checkpoint it: the frame is larger
    // than the text it came from, so re-scanning is the cheaper (and
    // cluster-safe — no executor-local blocks) side of that trade.
    val w = tk
      .select(col("doc_id"),
        explode(graft.functions.HashExpressions.positionalShinglesFast(col("toks"), 8)).as("pf"))
      .select(col("doc_id"), col("pf.p").as("p"), col("pf.fp").as("fp"))
    val b = w.groupBy("fp").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select("fp")
    val d = w.join(b, "fp").select("doc_id", "p")
    val isl = d.withColumn("grp",
      col("p") - row_number().over(Window.partitionBy("doc_id").orderBy("p")))
    val sp = isl.groupBy("doc_id", "grp")
      .agg(min("p").cast("long").as("span_start"),
        (max(col("p")) - min(col("p")) + 8).cast("long").as("span_len"))
    val top = sp.orderBy(col("span_len").desc, col("doc_id"), col("span_start"))
      .limit(20)
    // rank window runs on the 20-row limit result, never the corpus
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("span_len").desc, col("doc_id"), col("span_start")))
      .cast("long"))
      .select(col("rank"), col("doc_id"), col("span_start"), col("span_len"))
  }

  val all: Seq[QueryDef] = Seq(zorderLayout, repeatedSpans)
}
