package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.HashExpressions.{shingleHashesFast, winnowFast}
import graft.functions.TextFunctions.polyHashSql

/** Twenty-fifth curation batch: sampled decontamination (the winnowed
  * index as a decontam tier, with its recall against the exact tier
  * measured IN the query) and format detection (code/prose/numeric
  * routing, the pre-tokenizer fork every mixed corpus needs).
  */
object CurationQueries25 {

  /** WINNOW DECONTAM — test/train contamination flagging from the
    * SELECTED 8-gram fingerprints instead of the full 8-gram index,
    * with both tiers computed side by side: exact flags (any shared
    * df-capped 8-gram), sampled flags (any shared winnow-selected
    * 8-gram), the measured recall, and the index-size ratio the
    * sampling buys. The winnowing guarantee shapes the miss profile:
    * shared runs of >= 11 tokens (w+n-1) are caught BY CONSTRUCTION;
    * only short isolated 8-gram overlaps can slip — so sampled recall
    * IS the fraction of contamination that is run-shaped, a number
    * worth knowing before trading a 100-TB index for a ~2.5x smaller (w=4; density 2/(w+1))
    * one. Sampled flags are a SUBSET of exact flags by construction
    * (every selected fingerprint is an 8-gram hash) — the spec pins
    * it. SCALE: one hash-keyed aggregate over the exploded 8-gram
    * frame (df cap + both tiers' train-presence bits per hash) and one
    * hash-keyed join of the test fifth against it — the corpus never
    * re-joins per tier or per side.
    */
  val winnowDecontam: QueryDef = QueryDef.sql(
    "q_winnow_decontam",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh AS (SELECT doc_id, unnest(range(1, greatest(len(toks) - 6, 1))) AS pos, toks FROM tk),
       |hrow AS (SELECT doc_id, pos,
       |                ${polyHashSql("array_to_string(list_slice(toks, pos, pos + 7), ' ')")} AS h
       |         FROM sh),
       |hs AS (SELECT doc_id, list(h ORDER BY pos) AS h FROM hrow GROUP BY doc_id),
       |wins AS (SELECT doc_id,
       |                CASE WHEN len(h) >= 4
       |                     THEN list_transform(range(1, len(h) - 2),
       |                                         j -> list_min(list_slice(h, j, j + 3)))
       |                     ELSE [list_min(h)] END AS w
       |         FROM hs),
       |allh AS (SELECT DISTINCT doc_id, h FROM hrow),
       |df AS (SELECT h FROM allh GROUP BY h HAVING count(*) <= 64),
       |allk AS (SELECT allh.doc_id, allh.h FROM allh JOIN df ON df.h = allh.h),
       |selh AS (SELECT doc_id, unnest(list_distinct(w)) AS h FROM wins),
       |selk AS (SELECT selh.doc_id, selh.h FROM selh JOIN df ON df.h = selh.h),
       |trainh AS (SELECT DISTINCT h FROM allk WHERE doc_id % 5 <> 0),
       |trains AS (SELECT DISTINCT h FROM selk WHERE doc_id % 5 <> 0),
       |te AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
       |exact AS (SELECT DISTINCT a.doc_id FROM allk a JOIN trainh t ON t.h = a.h
       |          WHERE a.doc_id % 5 = 0),
       |sampled AS (SELECT DISTINCT s.doc_id FROM selk s JOIN trains t ON t.h = s.h
       |            WHERE s.doc_id % 5 = 0)
       |SELECT CAST((SELECT count(*) FROM te) AS BIGINT) AS n_test,
       |       CAST((SELECT count(*) FROM exact) AS BIGINT) AS exact_flagged,
       |       CAST((SELECT count(*) FROM sampled) AS BIGINT) AS winnow_flagged,
       |       CAST((SELECT count(*) FROM exact) - (SELECT count(*) FROM sampled) AS BIGINT) AS missed,
       |       CAST((SELECT count(*) FROM sampled) * 10000
       |            // greatest((SELECT count(*) FROM exact), 1) AS BIGINT) AS recall_bp,
       |       CAST((SELECT count(DISTINCT h) FROM selk) * 10000
       |            // greatest((SELECT count(DISTINCT h) FROM allk), 1) AS BIGINT) AS index_bp""".stripMargin) { (spark, dir) =>
    // One exploded pass instead of four: every selected fingerprint is
    // an 8-gram hash (winnow ⊆ shingle set), so a single (doc_id, h,
    // sel) frame feeds everything. The per-hash aggregate carries the
    // df cap AND both tiers' train-presence bits, so "h shared with a
    // train doc" is answered once per hash, not once per (tier × side)
    // join — the corpus crosses a hash-keyed exchange exactly twice
    // (aggregate, then the test-side fifth for flagging) instead of
    // the former three full join re-computations.
    val toks = split(col("text"), " ")
    val sides = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        shingleHashesFast(toks, 8).as("allh"),
        winnowFast(toks, 8, 4).as("selh"))
    // rows feeds the per-hash aggregate AND the test-side flag join;
    // hAgg feeds the flag join AND the index-size fold — materialize
    // each once or the double shingle+winnow kernel replays three
    // times (round 16; durability: round-12 ledger class)
    val rows = sides
      .select(col("doc_id"), explode(col("allh")).as("h"), col("selh"))
      .select(col("doc_id"), col("h"),
        array_contains(col("selh"), col("h")).cast("int").as("sel"))
      .localCheckpoint()
    val isTrain = (pmod(col("doc_id"), lit(5L)) =!= 0).cast("int")
    val hAgg = rows.groupBy("h").agg(
        count(lit(1)).as("dfh"),
        max(isTrain).as("tr_all"),
        max(isTrain * col("sel")).as("tr_sel"),
        max(col("sel")).as("any_sel"))
      .filter(col("dfh") <= 64)
      .localCheckpoint()
    val flags = rows.filter(pmod(col("doc_id"), lit(5L)) === 0)
      .join(hAgg, "h")
      .groupBy("doc_id").agg(
        max(col("tr_all")).as("ex"),
        max(col("sel") * col("tr_sel")).as("sm"))
      .agg(sum("ex").cast("long").as("exact_flagged"),
        sum("sm").cast("long").as("winnow_flagged"))
    val idx = hAgg.agg(count(lit(1)).as("nall"),
      sum("any_sel").cast("long").as("nsel"))
    val nTest = Tables(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(5L)) === 0).agg(count(lit(1)).as("n_test"))
    nTest.crossJoin(broadcast(flags)).crossJoin(broadcast(idx))
      .select(col("n_test"), col("exact_flagged"), col("winnow_flagged"),
        (col("exact_flagged") - col("winnow_flagged")).as("missed"),
        expr("winnow_flagged * 10000 DIV greatest(exact_flagged, 1)").as("recall_bp"),
        expr("nsel * 10000 DIV greatest(nall, 1)").as("index_bp"))
  }

  private val SymPat = """[{}();=<>\[\]]"""

  /** FORMAT DETECT — code/numeric/prose routing per source: symbol and
    * digit character ratios (bp) against fixed thresholds, the
    * pre-tokenizer fork that decides which cleaning pipeline a
    * document enters. The fixture is prose, so code and numeric
    * snippets are injected on id residues (the PII-batch pattern);
    * detection therefore has exact expected counts for the spec.
    * SCALE: map-only regex counting into a (sources x 3) aggregate.
    */
  val formatDetect: QueryDef = QueryDef.sql(
    "q_format_detect",
    s"""WITH a AS (SELECT source,
       |  (text || CASE WHEN doc_id % 7 = 2 THEN ' if (x == 1) { y = f(a[i]); } else { z[j] = g(); }' ELSE '' END
       |        || CASE WHEN doc_id % 9 = 3 THEN ' 12 34 567 890 11 22 33 44 55 66 77 88 99 00 10 20' ELSE '' END) AS aug
       |  FROM documents),
       |c AS (SELECT source,
       |  len(regexp_extract_all(aug, '$SymPat')) * 10000 // length(aug) AS sym_bp,
       |  len(regexp_extract_all(aug, '[0-9]')) * 10000 // length(aug) AS dig_bp
       |  FROM a),
       |k AS (SELECT source,
       |  CASE WHEN sym_bp >= 200 THEN 'code'
       |       WHEN dig_bp >= 400 THEN 'numeric'
       |       ELSE 'prose' END AS fmt, sym_bp, dig_bp
       |  FROM c)
       |SELECT source, fmt, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(sym_bp) // count(*) AS BIGINT) AS avg_sym_bp,
       |       CAST(sum(dig_bp) // count(*) AS BIGINT) AS avg_dig_bp
       |FROM k GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val aug = concat(col("text"),
      when(pmod(col("doc_id"), lit(7L)) === 2,
        lit(" if (x == 1) { y = f(a[i]); } else { z[j] = g(); }")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(9L)) === 3,
        lit(" 12 34 567 890 11 22 33 44 55 66 77 88 99 00 10 20")).otherwise(lit("")))
    Tables(spark, dir, "documents")
      .select(col("source"),
        size(regexp_extract_all(aug, lit(SymPat), lit(0))).cast("long").as("nsym"),
        size(regexp_extract_all(aug, lit("[0-9]"), lit(0))).cast("long").as("ndig"),
        length(aug).cast("long").as("la"))
      .select(col("source"),
        expr("nsym * 10000 DIV la").as("sym_bp"),
        expr("ndig * 10000 DIV la").as("dig_bp"))
      .select(col("source"),
        when(col("sym_bp") >= 200, "code")
          .when(col("dig_bp") >= 400, "numeric")
          .otherwise("prose").as("fmt"),
        col("sym_bp"), col("dig_bp"))
      .groupBy("source", "fmt")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(sym_bp) DIV count(*)").as("avg_sym_bp"),
        expr("sum(dig_bp) DIV count(*)").as("avg_dig_bp"))
  }

  val all: Seq[QueryDef] = Seq(winnowDecontam, formatDetect)
}
