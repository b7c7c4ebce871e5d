package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql}

/** Seventeenth curation batch: Holt linear trend smoothing (the
  * level+trend upgrade of `q_ewma`, and the batch twin of
  * `EventStreams.holtLevels`) and truncated-re-crawl detection
  * (positional PREFIX duplicates — the curation artifact that
  * containment/Jaccard tiers blur away, because a truncated page is
  * set-similar to its source only in proportion to the cut).
  */
object CurationQueries17 {

  /** HOLT LINEAR SMOOTHING — per event_type over the hourly count
    * series: level + trend double smoothing (alpha=0.3, beta=0.1) in
    * Q20 fixed point, with a 3-hour-ahead forecast l + 3b. The same
    * sequential-fold contract as `q_ewma`: the recursion runs over an
    * array bounded by the TIME HORIZON, not the corpus, so scale only
    * re-prices the hour-keyed count aggregate beneath it; the fold is
    * integer arithmetic (DIV truncates toward zero on both engines,
    * including for negative trends) so the oracle replays level and
    * trend bit-for-bit. ORACLE NOTE: the natural `list_reduce` with a
    * STRUCT accumulator is NONDETERMINISTICALLY WRONG in DuckDB on
    * ~680-element lists (verified: same literal list, different folds
    * across connections; scalar accumulators like q_ewma's are fine),
    * so the oracle runs the coupled fold as a RECURSIVE CTE instead —
    * one row per (event_type, step), plain column arithmetic, no
    * lambda machinery. `EventStreams.holtLevels` maintains the same
    * fold incrementally under a watermark; StreamingSpec pins
    * batch==stream equality.
    */
  val holt: QueryDef = QueryDef.sql(
    "q_holt",
    """WITH RECURSIVE hc AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
      |           FROM events GROUP BY 1, 2),
      |arr AS (SELECT event_type, list(c ORDER BY h) AS cs, count(*) AS nh
      |        FROM hc GROUP BY 1),
      |fold AS (
      |  SELECT event_type, cs, nh, 1 AS i, cs[1] * 1048576 AS l, CAST(0 AS BIGINT) AS b
      |  FROM arr
      |  UNION ALL
      |  SELECT event_type, cs, nh, i + 1,
      |         (3 * cs[i + 1] * 1048576 + 7 * (l + b)) // 10,
      |         ((3 * cs[i + 1] * 1048576 + 7 * (l + b)) // 10 - l + 9 * b) // 10
      |  FROM fold WHERE i < nh)
      |SELECT event_type, CAST(nh AS BIGINT) AS n_hours,
      |       CAST(cs[nh] AS BIGINT) AS last_cnt,
      |       CAST(l AS BIGINT) AS level_q20,
      |       CAST(b AS BIGINT) AS trend_q20,
      |       CAST(l + 3 * b AS BIGINT) AS forecast3_q20
      |FROM fold WHERE i = nh""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("h"), col("c")))).as("hs"))
      .select(col("event_type"), expr("transform(hs, x -> x.c)").as("cs"))
      .select(col("event_type"),
        size(col("cs")).cast("long").as("n_hours"),
        expr("cs[size(cs) - 1]").as("last_cnt"),
        expr("""aggregate(slice(cs, 2, size(cs) - 1),
                named_struct('l', cs[0] * CAST(1048576 AS BIGINT), 'b', CAST(0 AS BIGINT)),
                (acc, c) -> named_struct(
                  'l', (3 * c * 1048576 + 7 * (acc.l + acc.b)) DIV 10,
                  'b', ((3 * c * 1048576 + 7 * (acc.l + acc.b)) DIV 10 - acc.l + 9 * acc.b) DIV 10))
             """).as("hb"))
      .select(col("event_type"), col("n_hours"), col("last_cnt"),
        col("hb.l").as("level_q20"), col("hb.b").as("trend_q20"),
        (col("hb.l") + col("hb.b") * 3).as("forecast3_q20"))
  }

  /** PREFIX DUPLICATES — truncated re-crawls: documents that are a
    * strict token-boundary PREFIX of another document. The set-based
    * tiers under-score these (a half-truncation has Jaccard ~0.5, below
    * near-dup thresholds), yet they are pure redundancy for training.
    * Blocking is the first-8-token hash (truncation preserves the
    * head), df-capped at 64 so boilerplate heads cannot quadratify the
    * block join; candidates are then verified EXACTLY with a
    * token-boundary starts_with. The fixture carries no organic
    * truncations, so (as `q_corpus_diff` does for snapshots) the query
    * derives them deterministically: every 9th document contributes a
    * half-length variant under a shifted id — the detection MECHANISM
    * is the production shape. SCALE: one df-capped equi-join on an
    * 8-token head hash; decade probe (10x->100x) slope 1.02 — fully
    * linear, the constant being corpus text mass through the block
    * join. A candidate-fetch split (block join on (id, h8, len) only,
    * text joined back for candidates) was tried and REJECTED by its
    * own decade probe (1.02 -> 1.96): same-head blocks admit O(B^2)
    * length-ordered candidates, so fetching candidate text costs MORE
    * than shipping each document once — in-join verify wins whenever
    * block size beats the true-match rate.
    */
  val prefixDup: QueryDef = QueryDef.sql(
    "q_prefix_dup",
    s"""WITH tr AS (SELECT doc_id + 10000000 AS doc_id,
       |                  array_to_string(list_slice(string_split(text, ' '), 1,
       |                    (len(string_split(text, ' ')) + 1) // 2), ' ') AS text
       |           FROM documents WHERE doc_id % 9 = 0),
       |u AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM tr),
       |t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM u),
       |h AS (SELECT doc_id, text,
       |             ${polyHashSql("array_to_string(list_slice(toks, 1, 8), ' ')")} AS h8
       |      FROM t WHERE len(toks) >= 8),
       |kept AS (SELECT h8 FROM h GROUP BY h8 HAVING count(*) <= 64),
       |hk AS (SELECT h.* FROM h JOIN kept ON kept.h8 = h.h8),
       |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
       |             CAST(length(a.text) AS BIGINT) AS la,
       |             CAST(length(b.text) AS BIGINT) AS lb
       |      FROM hk a JOIN hk b ON a.h8 = b.h8 AND a.doc_id <> b.doc_id
       |      WHERE length(a.text) < length(b.text)
       |        AND starts_with(b.text, a.text || ' '))
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(count(DISTINCT ida) AS BIGINT) AS n_prefix_docs,
       |       CAST(count(DISTINCT idb) AS BIGINT) AS n_full_docs,
       |       CAST(CASE WHEN count(*) = 0 THEN 0
       |                 ELSE sum((la * 10000) // lb) // count(*) END AS BIGINT) AS avg_prefix_bp
       |FROM p""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val trunc = docs.filter(pmod(col("doc_id"), lit(9L)) === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        expr("array_join(slice(split(text, ' '), 1, (size(split(text, ' ')) + 1) DIV 2), ' ')")
          .as("text"))
    val t = docs.unionByName(trunc)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
    val h = t.select(col("doc_id"), col("text"),
      polyHash(array_join(slice(col("toks"), 1, 8), " ")).as("h8"))
    // ROUND-16 SHAPE: df-cap via count-over-window on ONE h8-keyed
    // exchange (the round-12 containment-family cut — was a groupBy +
    // join whose `kept` side replayed the union+tokenize+hash chain),
    // then ONE materialization feeding both self-join ends (was 4 chain
    // replays; durability: round-12 ledger class).
    val hk = h.withColumn("dfh", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h8"))))
      .filter(col("dfh") <= 64).drop("dfh")
      .localCheckpoint()
    hk.as("a").join(hk.as("b"),
        col("a.h8") === col("b.h8") && col("a.doc_id") =!= col("b.doc_id") &&
          length(col("a.text")) < length(col("b.text")) &&
          col("b.text").startsWith(concat(col("a.text"), lit(" "))))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        length(col("a.text")).cast("long").as("la"),
        length(col("b.text")).cast("long").as("lb"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("ida").as("n_prefix_docs"),
        countDistinct("idb").as("n_full_docs"),
        expr("CASE WHEN count(*) = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE sum((la * 10000) DIV lb) DIV count(*) END").as("avg_prefix_bp"))
  }

  val all: Seq[QueryDef] = Seq(holt, prefixDup)
}
