package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql}

/** Nineteenth curation batch: PII handling — detection (scan) and
  * removal (redaction), the compliance tier every training-data
  * pipeline runs before release. Patterns are written in the common
  * subset of Java regex (Spark) and RE2 (DuckDB) — `\b`, classes,
  * bounded repeats — so both engines match IDENTICAL spans; the
  * fixture carries no organic PII, so (as `q_prefix_dup` does for
  * truncations) deterministic synthetic PII is injected per doc-id
  * residue before scanning — the MECHANISM under test is the
  * production one.
  */
object CurationQueries19 {

  private val EmailPat = """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"""
  private val IpPat = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private val KeyPat = """\bsk[a-zA-Z0-9]{20,}\b"""

  /** Shared augmentation: every 7th doc gains an email, every 11th an
    * IPv4, every 13th a secret-key-shaped token (id-derived, so both
    * engines build byte-identical text).
    */
  private val augSql: String =
    "(text || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END" +
      " || CASE WHEN doc_id % 11 = 0 THEN ' host 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END" +
      " || CASE WHEN doc_id % 13 = 0 THEN ' token sk1234567890abcdefghij' || CAST(doc_id AS VARCHAR) ELSE '' END)"

  private def augCol = concat(col("text"),
    when(pmod(col("doc_id"), lit(7L)) === 0,
      concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(11L)) === 0,
      concat(lit(" host 10.0."), pmod(col("doc_id"), lit(200L)).cast("string"),
        lit("."), pmod(col("doc_id"), lit(250L)).cast("string")))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(13L)) === 0,
      concat(lit(" token sk1234567890abcdefghij"), col("doc_id").cast("string")))
      .otherwise(lit("")))

  /** PII SCAN — per source: documents flagged, and hit counts per
    * pattern class (email, IPv4, key-shaped secret). Pure map-side
    * regex counting into a sources-sized aggregate; at 100 TB this is
    * the audit pass that decides whether a shard needs the redaction
    * pass at all. SCALE: one scan, no joins, no text through shuffles.
    */
  val piiScan: QueryDef = QueryDef.sql(
    "q_pii_scan",
    s"""WITH a AS (SELECT source, $augSql AS aug FROM documents),
       |c AS (SELECT source,
       |  len(regexp_extract_all(aug, '$EmailPat')) AS e,
       |  len(regexp_extract_all(aug, '$IpPat')) AS i,
       |  len(regexp_extract_all(aug, '$KeyPat')) AS k
       |  FROM a)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN e + i + k > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
       |  CAST(sum(CASE WHEN e + i + k > 0 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS flagged_bp,
       |  CAST(sum(e) AS BIGINT) AS email_hits,
       |  CAST(sum(i) AS BIGINT) AS ip_hits,
       |  CAST(sum(k) AS BIGINT) AS key_hits
       |FROM c GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(col("source"),
        size(regexp_extract_all(augCol, lit(EmailPat), lit(0))).cast("long").as("e"),
        size(regexp_extract_all(augCol, lit(IpPat), lit(0))).cast("long").as("i"),
        size(regexp_extract_all(augCol, lit(KeyPat), lit(0))).cast("long").as("k"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("e") + col("i") + col("k") > 0, 1L).otherwise(0L)).as("flagged_docs"),
        expr("sum(CASE WHEN e + i + k > 0 THEN 1 ELSE 0 END) * 10000 DIV count(*)")
          .as("flagged_bp"),
        sum("e").as("email_hits"), sum("i").as("ip_hits"), sum("k").as("key_hits"))
  }

  /** PII REDACTION — the transform itself: emails -> <EMAIL>, IPs ->
    * <IP>, keys -> <KEY>, applied globally per document. Reports per
    * source: documents changed, net characters removed, and the XOR of
    * redacted-content hashes — the `q_shard_manifest` integrity fold,
    * here certifying that a re-run of the redaction pass produced the
    * byte-identical release. The oracle replays the same three
    * replaces (DuckDB needs the explicit 'g' flag; Spark replaces all
    * matches by default — an engine-parity trap worth pinning).
    * SCALE: map-only transform + sources-sized aggregate.
    */
  val redact: QueryDef = QueryDef.sql(
    "q_redact",
    s"""WITH a AS (SELECT source, $augSql AS aug FROM documents),
       |r AS (SELECT source, aug,
       |  regexp_replace(regexp_replace(regexp_replace(aug,
       |    '$EmailPat', '<EMAIL>', 'g'), '$IpPat', '<IP>', 'g'), '$KeyPat', '<KEY>', 'g') AS red
       |  FROM a)
       |SELECT source,
       |  CAST(sum(CASE WHEN red <> aug THEN 1 ELSE 0 END) AS BIGINT) AS docs_changed,
       |  CAST(sum(length(aug) - length(red)) AS BIGINT) AS chars_removed,
       |  CAST(bit_xor(${polyHashSql("red")}) AS BIGINT) AS xor_redacted
       |FROM r GROUP BY 1""".stripMargin) { (spark, dir) =>
    val red = regexp_replace(regexp_replace(regexp_replace(augCol,
      lit(EmailPat), lit("<EMAIL>")), lit(IpPat), lit("<IP>")), lit(KeyPat), lit("<KEY>"))
    Tables(spark, dir, "documents")
      .select(col("source"), augCol.as("aug"), red.as("red"))
      .select(col("source"), col("aug"), col("red"), polyHash(col("red")).as("h"))
      .groupBy("source")
      .agg(sum(when(col("red") =!= col("aug"), 1L).otherwise(0L)).as("docs_changed"),
        sum(length(col("aug")).cast("long") - length(col("red"))).as("chars_removed"),
        expr("bit_xor(h)").as("xor_redacted"))
  }

  val all: Seq[QueryDef] = Seq(piiScan, redact)
}
