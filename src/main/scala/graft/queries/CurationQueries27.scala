package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.HashExpressions.winnowFast
import graft.functions.TextFunctions.polyHashSql

/** Twenty-seventh batch: the winnow TUNER — measured density and
  * guarantee threshold per window width, the `q_lsh_tuning` companion
  * for the fingerprint family (LSH tunes band count against an S-curve;
  * winnowing tunes window width against index size vs the shortest
  * run it still guarantees to catch).
  */
object CurationQueries27 {

  private val Widths = Seq(2, 4, 8, 16)

  /** WINNOW TUNING — for w in {2,4,8,16} over the real corpus: window
    * count, selected-fingerprint count, realized density (bp) vs the
    * theoretical 2/(w+1), and the guarantee length w+n-1 (the shortest
    * shared token run that is ALWAYS caught). Doubling w roughly
    * halves the index but lengthens the guaranteed-catch threshold —
    * this query prices that trade on the corpus's own hash stream
    * instead of assuming the uniform-hash theory. SCALE: one map pass
    * per width (4 kernel passes over the same scan), bucket-free
    * 4-row aggregate.
    */
  val winnowTuning: QueryDef = QueryDef.sql(
    "q_winnow_tuning",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh AS (SELECT doc_id, unnest(range(1, greatest(len(toks) - 1, 1))) AS pos, toks FROM tk),
       |hrow AS (SELECT doc_id, pos,
       |                ${polyHashSql("array_to_string(list_slice(toks, pos, pos + 2), ' ')")} AS h
       |         FROM sh),
       |hs AS (SELECT doc_id, list(h ORDER BY pos) AS h FROM hrow GROUP BY doc_id),
       |per AS (SELECT w.w AS w, hs.doc_id,
       |               CASE WHEN len(h) >= w.w THEN len(h) - w.w + 1
       |                    WHEN len(h) >= 1 THEN 1 ELSE 0 END AS nw,
       |               len(list_distinct(
       |                 CASE WHEN len(h) >= w.w
       |                      THEN list_transform(range(1, len(h) - w.w + 2),
       |                                          j -> list_min(list_slice(h, j, j + w.w - 1)))
       |                      ELSE [list_min(h)] END)) AS nf
       |        FROM hs CROSS JOIN (SELECT unnest([2, 4, 8, 16]) AS w) w)
       |SELECT CAST(w AS BIGINT) AS w,
       |       CAST(w + 2 AS BIGINT) AS guarantee_len,
       |       CAST(sum(nw) AS BIGINT) AS n_windows,
       |       CAST(sum(nf) AS BIGINT) AS n_fp,
       |       CAST(sum(nf) * 10000 // greatest(sum(nw), 1) AS BIGINT) AS density_bp,
       |       CAST(20000 // (w + 1) AS BIGINT) AS theory_bp
       |FROM per GROUP BY w""".stripMargin) { (spark, dir) =>
    val toks = split(col("text"), " ")
    val m = greatest(size(toks) - 2, lit(0))
    val docs = Tables(spark, dir, "documents")
    Widths.map { w =>
      val nw = when(m >= w, m - (w - 1)).when(m >= 1, lit(1)).otherwise(lit(0))
      docs.select(lit(w.toLong).as("w"),
          nw.cast("long").as("nw"),
          size(winnowFast(toks, 3, w)).cast("long").as("nf"))
    }.reduce(_ unionByName _)
      .groupBy("w")
      .agg(count(lit(1)).as("nd"), sum("nw").as("n_windows"), sum("nf").as("n_fp"))
      .select(col("w"), (col("w") + 2).as("guarantee_len"),
        col("n_windows"), col("n_fp"),
        expr("n_fp * 10000 DIV greatest(n_windows, 1)").as("density_bp"),
        expr("20000 DIV (w + 1)").as("theory_bp"))
  }

  val all: Seq[QueryDef] = Seq(winnowTuning)
}
