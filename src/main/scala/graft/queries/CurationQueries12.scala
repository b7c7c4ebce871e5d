package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHashSql, shinglesSql}
import graft.operators.Dedup

/** Twelfth curation batch: the two remaining set-similarity-join
  * design tools — PPJoin-style PREFIX FILTERING (Chaudhuri et al.
  * 2006 / Xiao et al. 2008), the published exact algorithm for
  * high-threshold similarity joins, and the LSH BAND-TUNING planner
  * (the S-curve (b, r) decision, computed exactly in integers).
  */
object CurationQueries12 {

  /** PREFIX-FILTERED exact similarity join at Jaccard ≥ 0.7 — the
    * PPJoin candidate scheme: order every document's shingles by
    * GLOBAL (df, h) — rare first — and emit only the first
    * |d| − ⌈0.7·|d|⌉ + 1 as blocking keys; two documents can reach
    * 0.7 only if their prefixes share a key (pigeonhole on the rarest
    * tokens), plus the length filter 7·|a| ≤ 10·|b| ≤ 100·|a|/7.
    * The ORACLE is the naive full-blocking join at the same
    * threshold, so the driver's hash-compare literally verifies the
    * algorithm's no-false-negatives theorem on this corpus.
    *
    * SCALE: this is the production answer to the hot-shingle problem
    * WITHOUT a df cap — corpus-stopword shingles have maximal df, so
    * the (df, h) sort puts them LAST and they never enter a prefix;
    * candidate mass is bounded by rare-token collisions. The per-doc
    * ordering needs NO global rank: (df, h) pairs sort identically
    * everywhere (ties broken by h), so an array_sort per doc after
    * one vocabulary-keyed df join suffices. Verification reuses the
    * shared pair-Jaccard kernel.
    */
  val ppjoin: QueryDef = QueryDef.sql(
    "q_ppjoin",
    s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql("string_split(text, ' ')", 3)}) AS s
       |            FROM documents),
       |hs AS (SELECT DISTINCT doc_id, ${polyHashSql("s")} AS h FROM sh),
       |card AS (SELECT doc_id, count(*) AS c FROM hs GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
       |          FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT i.ida, i.idb,
       |       CAST(i.i AS DOUBLE) / (ca.c + cb.c - i.i) AS jaccard
       |FROM inter i JOIN card ca ON ca.doc_id = i.ida
       |             JOIN card cb ON cb.doc_id = i.idb
       |WHERE CAST(i.i AS DOUBLE) / (ca.c + cb.c - i.i) >= 0.7""".stripMargin) {
    (spark, dir) =>
      // hs feeds the df build AND the per-doc sort join — one explode
      // pass (round 16; durability: round-12 ledger class)
      val hs = Dedup.shingleHashTable(Tables(spark, dir, "documents"), "doc_id", "text", 3)
        .localCheckpoint()
      // df stays the groupBy + re-join form HERE deliberately (round 12
      // measured both): the count-over-window cut saves one corpus
      // shuffle but concentrates each hot shingle into ONE window task
      // that AQE cannot split — and ppjoin, unlike the overlap family's
      // dup-collapsed diagnostic, feeds the RAW corpus in, so the
      // mega-dup boilerplate key regressed 0.12 → 0.47 under the window
      // (53 s at the 100x dup replica) while the join form's groupBy
      // partial-aggregates map-side and its join is AQE-skew-splittable.
      // Rule recorded in PLANS.md: window-df for skew-collapsed or
      // capped inputs, join-df wherever a hot raw key can concentrate.
      val df_ = hs.groupBy("h").agg(count(lit(1)).as("df"))
      val sorted = hs.join(df_, "h") // vocabulary-keyed join
        .groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("sh"),
          count(lit(1)).as("c"))
      // prefix size |d| - ceil(0.7|d|) + 1; ceil(7n/10) = (7n+9) DIV 10
      // prefix frame feeds both self-join ends — one df-join + sort
      // chain, not two (round 16; durability: round-12 ledger class)
      val pref = sorted.select(col("doc_id"), col("c"),
        explode(expr("slice(sh, 1, CAST(size(sh) - (7 * size(sh) + 9) DIV 10 + 1 AS INT))"))
          .as("p"))
        .select(col("doc_id"), col("c"), col("p.h").as("h"))
        .localCheckpoint()
      val cand = pref.select(col("doc_id").as("ida"), col("c").as("pca"), col("h"))
        .join(pref.select(col("doc_id").as("idb"), col("c").as("pcb"), col("h")), "h")
        .filter(col("ida") < col("idb") &&
          col("pca") * 7 <= col("pcb") * 10 && col("pcb") * 7 <= col("pca") * 10)
        .select("ida", "idb").distinct()
      // verify from map-side sets: no corpus aggregation in the verify;
      // both verify ends read one materialized set frame (round 16)
      Dedup.jaccardForPairsSets(cand,
          Dedup.shingleSets(Tables(spark, dir, "documents"), "doc_id", "text", 3)
            .localCheckpoint(), "doc_id")
        .filter(col("jaccard") >= 0.7)
        .select(col("ida"), col("idb"), col("jaccard"))
  }

  /** LSH BAND-TUNING planner — the (bands, rows) decision for an
    * 8-hash MinHash signature as a query: for every factorization
    * b·r = 8 and Jaccard grid point j = x/10, the candidate
    * probability 1 − (1 − j^r)^b, computed EXACTLY in integers:
    * p_ppm = (10^8 − (10^r − x^r)^b) · 10^6 DIV 10^8 (r·b = 8 makes
    * the denominator uniform) — no pow(), no doubles, so both engines
    * agree bit-for-bit. Read a row set per config and pick the
    * S-curve that brackets the target threshold; this is the planning
    * table behind `Dedup.lshCandidates`' 4×2 default and the
    * `scaledBitsPerBand` escalation. SCALE: 4×5 literal rows — the
    * planner costs nothing, which is why it can run fleet-wide per
    * corpus before choosing a dedup config.
    */
  val lshTuning: QueryDef = {
    val configs = Seq((1, 8), (2, 4), (4, 2), (8, 1))
    val js = Seq(1, 3, 5, 7, 9)
    def powTxt(base: String, n: Int): String = Seq.fill(n)(base).mkString(" * ")
    def rowsSql: String = (for ((b, r) <- configs; x <- js) yield {
      val xr = powTxt(x.toString, r) // x^r
      val tenR = math.pow(10, r).toLong // 10^r exact for r <= 8
      val inner = s"($tenR - ($xr))" // 10^r - x^r
      val innB = powTxt(inner, b) // (10^r - x^r)^b
      s"SELECT $b AS bands, $r AS rows_per_band, $x AS j_x10, " +
        s"CAST(CAST(100000000 - ($innB) AS BIGINT) * 1000000 // 100000000 AS BIGINT) AS p_ppm"
    }).mkString("\nUNION ALL ")
    QueryDef.sql(
      "q_lsh_tuning",
      s"""SELECT CAST(bands AS BIGINT) AS bands,
         |       CAST(rows_per_band AS BIGINT) AS rows_per_band,
         |       CAST(j_x10 AS BIGINT) AS j_x10, p_ppm
         |FROM ($rowsSql)""".stripMargin) { (spark, dir) =>
      val rows = for ((b, r) <- configs; x <- js) yield {
        val xr = math.pow(x, r).toLong
        val tenR = math.pow(10, r).toLong
        val innB = BigInt(tenR - xr).pow(b)
        require(innB <= BigInt(100000000L), "r*b=8 keeps the scale at 10^8")
        val pPpm = (BigInt(100000000L) - innB) * 1000000 / 100000000
        (b.toLong, r.toLong, x.toLong, pPpm.toLong)
      }
      import spark.implicits._
      rows.toDF("bands", "rows_per_band", "j_x10", "p_ppm")
    }
  }

  val all: Seq[QueryDef] = Seq(ppjoin, lshTuning)
}
