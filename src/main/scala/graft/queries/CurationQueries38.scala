package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql}
import graft.operators.CorpusMerge

/** Thirty-eighth curation batch (round 16): the write-side MERGE the
  * round-15 verdict named as the engine's missing write shape, and the
  * DP sum/mean release that rounds out the privacy suite (counts
  * released in round 14, groups in round 15).
  */
object CurationQueries38 {

  /** COPY-ON-WRITE CORPUS MERGE — [[graft.operators.CorpusMerge]]
    * driven end-to-end under the oracle gate: documents become a
    * bucketed base corpus (version 0), a deterministic delta derived
    * from the same table exercises every row of the MERGE matrix —
    * revision (`doc_id % 10 = 0`, version 1), STALE replay that must
    * NOT land (`% 10 = 2`, version −1), takedown tombstone (`% 10 =
    * 5`), fresh insert (`% 10 = 7`, shifted key) — and the query
    * returns the merged corpus (id, version, lang, content fingerprint)
    * for DuckDB to rebuild relationally with a FULL OUTER JOIN.
    *
    * SCALE: the merge itself is Θ(delta + touched buckets) — the base
    * read is partition-pruned to the delta's bucket set and only those
    * buckets rewrite (dynamic partition overwrite; untouched files are
    * byte-identical, CorpusMergeSpec pins it). The fixture delta
    * deliberately touches most buckets to exercise semantics; the
    * Θ(delta) claim is the spec's plan-shape + byte-identity receipt,
    * not this query's. The read-back is Θ(base) because the ORACLE
    * compares the whole merged corpus — a production merge ends at the
    * write.
    */
  val corpusMerge: QueryDef = QueryDef.sql(
    "q_corpus_merge",
    """WITH base AS (SELECT doc_id, text, lang, CAST(0 AS BIGINT) AS version
      |              FROM documents),
      |d AS (SELECT doc_id, text || ' [rev]' AS text, lang,
      |             CAST(1 AS BIGINT) AS version, FALSE AS deleted
      |      FROM documents WHERE doc_id % 10 = 0
      |      UNION ALL
      |      SELECT doc_id, 'STALE', lang, CAST(-1 AS BIGINT), FALSE
      |      FROM documents WHERE doc_id % 10 = 2
      |      UNION ALL
      |      SELECT doc_id, '', lang, CAST(1 AS BIGINT), TRUE
      |      FROM documents WHERE doc_id % 10 = 5
      |      UNION ALL
      |      SELECT doc_id + 10000000, text, lang, CAST(1 AS BIGINT), FALSE
      |      FROM documents WHERE doc_id % 10 = 7),
      |m AS (SELECT coalesce(d.doc_id, b.doc_id) AS doc_id,
      |             CASE WHEN d.doc_id IS NOT NULL
      |                   AND (b.doc_id IS NULL OR d.version >= b.version)
      |                  THEN 1 ELSE 0 END AS dw,
      |             d.text AS dtext, b.text AS btext,
      |             d.lang AS dlang, b.lang AS blang,
      |             d.version AS dv, b.version AS bv,
      |             coalesce(d.deleted, FALSE) AS del
      |      FROM base b FULL OUTER JOIN d ON b.doc_id = d.doc_id)
      |SELECT doc_id,
      |       CASE WHEN dw = 1 THEN dv ELSE bv END AS version,
      |       CASE WHEN dw = 1 THEN dlang ELSE blang END AS lang,
      |       md5(CASE WHEN dw = 1 THEN dtext ELSE btext END) AS content_md5,
      |       CAST(length(CASE WHEN dw = 1 THEN dtext ELSE btext END) AS BIGINT)
      |         AS n_chars
      |FROM m WHERE NOT (dw = 1 AND del)""".stripMargin) { (spark, dir) =>
    val root = s"/tmp/graft_artifacts/${spark.sparkContext.applicationId}/" +
      dir.replaceAll("[^A-Za-z0-9.]", "_") + "/cow_corpus"
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    CorpusMerge.writeBase(docs.withColumn("version", lit(0L)), "doc_id", root, 32)
    // ONE scan, not a 4-way union of scans: the four delta branches are
    // keyed on disjoint doc_id residues, so a single filtered projection
    // with per-branch CASEs emits the identical row set (oracle-proven)
    // while reading the corpus once
    val m = col("doc_id") % 10
    val delta = docs.filter(m.isin(0, 2, 5, 7))
      .select(
        when(m === 7, col("doc_id") + 10000000L).otherwise(col("doc_id")).as("doc_id"),
        when(m === 0, concat(col("text"), lit(" [rev]")))
          .when(m === 2, lit("STALE"))
          .when(m === 5, lit(""))
          .otherwise(col("text")).as("text"),
        col("lang"),
        when(m === 2, lit(-1L)).otherwise(lit(1L)).as("version"),
        (m === 5).as("deleted"))
    CorpusMerge.merge(spark, root, delta, "doc_id", nBuckets = 32)
    spark.read.parquet(root).select(col("doc_id"), col("version"), col("lang"),
      md5(col("text").cast("binary")).as("content_md5"),
      length(col("text")).cast("long").as("n_chars"))
  }

  /** DP SUM + MEAN RELEASE — the numeric companion to `q_dp_counts`
    * (`CurationQueries36`), completing the release suite. Per event
    * type, the sum of the CLIPPED per-record value (`clamp(floor(
    * value), 0, C)` with C = 200 — bounded contribution is what gives
    * the sum finite sensitivity) is released through the same
    * deterministic two-sided-geometric mechanism, SCALED BY C: noise =
    * sign · (trailing one-bits of a 20-bit keyed hash) · C, i.e. a
    * discrete Laplace step of C per unit — ε = ln 2 for the
    * C-sensitive sum, exactly matching the count release's ε = ln 2 at
    * sensitivity 1. The sum draw is keyed on `'sum:' || event_type`,
    * an INDEPENDENT draw from the count's (different key → different
    * hash — the polyHash affinity caveat does not apply across the
    * prefix because the multiplier chain shifts by the prefix length).
    *
    * ε-COMPOSITION, stated: this query re-releases the counts (same
    * keyed draw as `q_dp_counts`, so re-release costs NOTHING extra —
    * same key, same noise, no averaging leak) and adds the sum
    * release: total budget across the suite is ε_count + ε_sum =
    * 2 ln 2 by sequential composition. `released_mean_bp` =
    * floor(released_sum · 10⁴ / released_n) is POST-PROCESSING of the
    * two releases — free under DP. Both engines compute it as
    * IEEE-754 double division + floor (bit-identical), with the noisy
    * quantities kept exact-integer to that point.
    *
    * SCALE: one enum-keyed aggregate (map-side clip + partial sums) +
    * driver-free integer bit algebra — |event types| rows on the wire.
    */
  val dpSums: QueryDef = QueryDef.sql(
    "q_dp_sums", {
      val hc = polyHashSql("event_type")
      val hs = polyHashSql("('sum:' || event_type)")
      s"""WITH c AS (SELECT event_type,
         |                  CAST(sum(least(greatest(CAST(floor(value) AS BIGINT), 0), 200))
         |                       AS BIGINT) AS s,
         |                  CAST(count(*) AS BIGINT) AS n
         |           FROM events GROUP BY event_type),
         |d AS (SELECT event_type, s, n,
         |             ($hc) % 1048576 AS cu20, (($hc) // 1048576) % 2 AS csbit,
         |             ($hs) % 1048576 AS su20, (($hs) // 1048576) % 2 AS ssbit
         |      FROM c),
         |m AS (SELECT event_type, s, n,
         |             CAST(length(bin(cu20)) - length(rtrim(bin(cu20), '1')) AS BIGINT) AS cmag,
         |             CASE WHEN csbit = 1 THEN 1 ELSE -1 END AS csgn,
         |             CAST(length(bin(su20)) - length(rtrim(bin(su20), '1')) AS BIGINT) AS smag,
         |             CASE WHEN ssbit = 1 THEN 1 ELSE -1 END AS ssgn
         |      FROM d)
         |SELECT event_type,
         |       CAST(s + ssgn * smag * 200 AS BIGINT) AS released_sum,
         |       CAST(ssgn * smag * 200 AS BIGINT) AS noise_sum,
         |       CAST(n + csgn * cmag AS BIGINT) AS released_n,
         |       CAST(floor(CAST(s + ssgn * smag * 200 AS DOUBLE) * 10000
         |                  / (n + csgn * cmag)) AS BIGINT) AS released_mean_bp
         |FROM m""".stripMargin
    }) { (spark, dir) =>
    val hc = polyHash(col("event_type"))
    val hs = polyHash(concat(lit("sum:"), col("event_type")))
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(sum(least(greatest(floor(col("value")).cast("long"), lit(0L)), lit(200L))).as("s"),
        count(lit(1)).as("n"))
      .withColumn("cu20", pmod(hc, lit(1048576L)))
      .withColumn("csbit", pmod(shiftright(hc, 20), lit(2L)))
      .withColumn("su20", pmod(hs, lit(1048576L)))
      .withColumn("ssbit", pmod(shiftright(hs, 20), lit(2L)))
      .withColumn("cmag",
        (length(bin(col("cu20"))) - length(rtrim(bin(col("cu20")), "1"))).cast("long"))
      .withColumn("smag",
        (length(bin(col("su20"))) - length(rtrim(bin(col("su20")), "1"))).cast("long"))
      .withColumn("csgn", when(col("csbit") === 1L, 1L).otherwise(-1L))
      .withColumn("ssgn", when(col("ssbit") === 1L, 1L).otherwise(-1L))
      .select(col("event_type"),
        (col("s") + col("ssgn") * col("smag") * lit(200L)).as("released_sum"),
        (col("ssgn") * col("smag") * lit(200L)).as("noise_sum"),
        (col("n") + col("csgn") * col("cmag")).as("released_n"),
        floor((col("s") + col("ssgn") * col("smag") * lit(200L)).cast("double") * 10000
          / (col("n") + col("csgn") * col("cmag"))).cast("long").as("released_mean_bp"))
  }

  val all: Seq[QueryDef] = Seq(corpusMerge, dpSums)
}
