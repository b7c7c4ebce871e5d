package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Second curation batch: BPE merge induction, corpus length profiling,
  * latest-version record dedup, robust (winsorized) aggregation, and the
  * per-source mixing dashboard. Same determinism discipline as
  * [[CurationQueries]]: integer counts and ranks everywhere; doubles only
  * pass through untouched or ride the per-row DECIMAL cast.
  */
object CurationQueries2 {

  /** BPE merge induction, step one: the corpus-wide adjacent character-
    * pair frequencies inside tokens — the statistic a byte-pair-encoding
    * tokenizer trainer maximizes at every merge step. Top-20 planned as
    * `TakeOrderedAndProject` (per-partition heap, never a global sort).
    * The char split is materialized once per token BEFORE the pair
    * lambda (subexpression elimination does not cross lambda boundaries
    * — the `q_trigram_top` lesson, 3.5-5x).
    */
  val bpePairs: QueryDef = QueryDef.sql(
    "q_bpe_pairs",
    """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |ch AS (SELECT string_split(tok, '') AS cs FROM tk),
      |pr AS (SELECT cs[i] || cs[i + 1] AS pair
      |       FROM ch, UNNEST(range(1, len(cs))) t(i))
      |SELECT pair, CAST(count(*) AS BIGINT) AS cnt
      |FROM pr GROUP BY pair
      |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin) { (spark, dir) =>
    val cs = col("cs")
    Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(split(col("tok"), "").as("cs"))
      .filter(size(cs) >= 2)
      .select(explode(transform(sequence(lit(1), size(cs) - 1),
        i => concat(element_at(cs, i), element_at(cs, i + 1)))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)
  }

  /** Token-length histogram in width-8 buckets — the sequence-length
    * profile that sizes packing/truncation budgets before training. One
    * map-side pass plus a bucket-keyed aggregation (bucket count is
    * bounded by max document length / 8, so state is tiny at any scale).
    */
  val lengthBuckets: QueryDef = QueryDef.sql(
    "q_length_buckets",
    """WITH m AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |           FROM documents)
      |SELECT CAST(n_tokens // 8 * 8 AS BIGINT) AS bucket_lo,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
      |       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
      |       CAST(max(n_tokens) AS BIGINT) AS max_tokens
      |FROM m GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy((floor(col("n_tokens") / 8) * 8).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tot_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
  }

  /** Latest-version record dedup — keep each user's newest event (CDC
    * compaction / "latest wins" upsert semantics, the keyed-dedup shape
    * every incremental corpus ingest runs). One window per key with the
    * (ts, event_id) total order; at scale this is a single shuffle on
    * user_id with a per-partition top-1 heap (WindowGroupLimit caps
    * state at one row per key). Timestamps exported as epoch-µs BIGINT
    * (the ledger's cross-engine timestamp convention).
    */
  val latestEvent: QueryDef = QueryDef.sql(
    "q_latest_event",
    """SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |       event_type, value
      |FROM (SELECT user_id, event_id, ts, event_type, value,
      |             row_number() OVER (PARTITION BY user_id
      |                                ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) WHERE rn = 1""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
  }

  /** Winsorized (percentile-clipped) aggregate — the robust-statistics
    * step a metrics pipeline applies before averaging heavy-tailed
    * values. Clip bounds are NEAREST-RANK percentiles (p05/p95) computed
    * with integer rank arithmetic (`rn·20 ≥ n` ⟺ rank ≥ 0.05·n), not
    * interpolated quantiles — interpolation arithmetic differs across
    * engines, exact order statistics do not. The clipped sum rides the
    * per-row DECIMAL cast (values are 2-decimal doubles, so the cast is
    * exact and the sum order-independent).
    */
  val winsorize: QueryDef = QueryDef.sql(
    "q_winsorize",
    """WITH r AS (SELECT event_type, event_id, value,
      |                  row_number() OVER (PARTITION BY event_type
      |                                     ORDER BY value, event_id) AS rn,
      |                  count(*) OVER (PARTITION BY event_type) AS n
      |           FROM events),
      |b AS (SELECT event_type,
      |             min(CASE WHEN rn * 20 >= n THEN value END) AS lo,
      |             min(CASE WHEN rn * 20 >= n * 19 THEN value END) AS hi
      |      FROM r GROUP BY 1)
      |SELECT e.event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |       CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |       b.lo, b.hi,
      |       CAST(sum(CAST(least(greatest(e.value, b.lo), b.hi) AS DECIMAL(18,4))) AS DOUBLE)
      |         AS clipped_sum
      |FROM events e JOIN b USING (event_type)
      |GROUP BY e.event_type, b.lo, b.hi""".stripMargin) { (spark, dir) =>
    val events = Tables.events(spark, dir)
    // ranks via the segmented scan (round 13): a row_number window
    // partitioned by the handful of event types puts each type's whole
    // event stream through one task (the packer-postmortem parallelism
    // ceiling); PrefixSum.rowNumber keeps the identical (value, id)
    // order at full parallelism, and the type-sized count frame joins
    // back unhinted (AQE broadcasts it on its real stats)
    val et = events.select(col("event_type"), col("event_id"), col("value"))
    val cnt = et.groupBy("event_type").agg(count(lit(1)).as("n"))
    val b = graft.operators.PrefixSum.rowNumber(et, "event_type",
        Seq(col("value").asc, col("event_id").asc), "rn")
      .join(cnt, "event_type")
      .groupBy("event_type")
      .agg(min(when(col("rn") * 20 >= col("n"), col("value"))).as("lo"),
        min(when(col("rn") * 20 >= col("n") * 19, col("value"))).as("hi"))
    events.join(b, "event_type")
      .groupBy("event_type", "lo", "hi")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo"), 1).otherwise(0)).cast("long").as("n_lo"),
        sum(when(col("value") > col("hi"), 1).otherwise(0)).cast("long").as("n_hi"),
        sum(least(greatest(col("value"), col("lo")), col("hi"))
          .cast("decimal(18,4)")).cast("double").as("clipped_sum"))
      .select(col("event_type"), col("n"), col("n_lo"), col("n_hi"),
        col("lo"), col("hi"), col("clipped_sum"))
  }

  /** Per-source corpus profile — the source-mixing dashboard (docs,
    * token/char volume, language spread per provenance). One keyed
    * aggregation; the distinct-language count is per-source state bounded
    * by the language alphabet.
    */
  val sourceProfile: QueryDef = QueryDef.sql(
    "q_source_profile",
    """SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tot_tokens,
      |       CAST(sum(n_chars) AS BIGINT) AS tot_chars,
      |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM documents GROUP BY source""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("tot_tokens"),
        sum(col("n_chars")).as("tot_chars"),
        countDistinct(col("lang")).as("n_langs"))
  }

  val all: Seq[QueryDef] = Seq(bpePairs, lengthBuckets, latestEvent,
    winsorize, sourceProfile)
}
