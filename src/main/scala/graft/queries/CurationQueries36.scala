package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql}

/** Thirty-sixth curation batch (round 14): privacy / compliance release
  * operators — the k-anonymity audit a dataset release runs over its
  * quasi-identifiers, and a differentially-private count release with
  * a deterministic two-sided geometric mechanism (so the oracle can pin
  * the mechanism itself, not just its shape).
  */
object CurationQueries36 {

  /** K-ANONYMITY AUDIT — group the table by its quasi-identifier tuple
    * (nation × market segment) and flag every group smaller than k=10:
    * records in a flagged group are re-identifiable by their QI alone
    * and must be suppressed or generalized before release. The fixture
    * yields group sizes 5–21, so both flags occur and the oracle pins
    * the threshold edge exactly.
    *
    * SCALE: one enum-keyed aggregate (the QI domain is bounded by the
    * data dictionary) — partial-aggregated map-side, |QI-domain| rows
    * on the wire.
    */
  val kanonAudit: QueryDef = QueryDef.sql(
    "q_kanon_audit",
    """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS group_size,
      |       CAST(CASE WHEN count(*) < 10 THEN 1 ELSE 0 END AS BIGINT) AS suppress
      |FROM customer GROUP BY c_nationkey, c_mktsegment""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("group_size"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("group_size"),
        when(col("group_size") < 10, 1L).otherwise(0L).as("suppress"))
  }

  /** DP COUNT RELEASE — per-event-type counts released through a
    * two-sided geometric mechanism (the discrete Laplace: the standard
    * integer-valued ε-DP noise for counting queries; here α = 1/2,
    * i.e. ε = ln 2 per count). The noise is DETERMINISTIC — magnitude =
    * trailing one-bits of a 20-bit hash of the key (geometric(1/2) over
    * uniform bits by construction), sign = the 21st bit — so both
    * engines derive the identical draw and the oracle verifies the
    * MECHANISM (a production release would use a sealed RNG and emit
    * only `released_n`; `noise` is emitted here because the gate checks
    * it). Keyed noise also demonstrates the release property that
    * matters operationally: re-running the release does not leak via
    * noise averaging (same key → same draw).
    *
    * SCALE: one enum-keyed aggregate + map-side integer bit algebra.
    */
  val dpCounts: QueryDef = QueryDef.sql(
    "q_dp_counts", {
      val h = polyHashSql("event_type")
      s"""WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
         |           GROUP BY event_type),
         |d AS (SELECT event_type, n, ($h) % 1048576 AS u20, (($h) // 1048576) % 2 AS sbit
         |      FROM c),
         |m AS (SELECT event_type, n,
         |             CAST(length(bin(u20)) - length(rtrim(bin(u20), '1')) AS BIGINT) AS mag,
         |             CASE WHEN sbit = 1 THEN 1 ELSE -1 END AS sgn
         |      FROM d)
         |SELECT event_type,
         |       CAST(n + sgn * mag AS BIGINT) AS released_n,
         |       CAST(sgn * mag AS BIGINT) AS noise
         |FROM m""".stripMargin
    }) { (spark, dir) =>
    val h = polyHash(col("event_type"))
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("u20", pmod(h, lit(1048576L)))
      // exact integer bit algebra: h is non-negative, so h >> 20 equals
      // the oracle's h // 1048576 (never float-divide 60-bit hashes)
      .withColumn("sbit", pmod(shiftright(h, 20), lit(2L)))
      .withColumn("mag",
        (length(bin(col("u20"))) - length(rtrim(bin(col("u20")), "1"))).cast("long"))
      .withColumn("sgn", when(col("sbit") === 1L, 1L).otherwise(-1L))
      .select(col("event_type"),
        (col("n") + col("sgn") * col("mag")).as("released_n"),
        (col("sgn") * col("mag")).as("noise"))
  }

  val all: Seq[QueryDef] = Seq(kanonAudit, dpCounts)
}
