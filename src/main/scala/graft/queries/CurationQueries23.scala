package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql, tokens}

/** Twenty-third curation batch: filter-rule ATTRIBUTION (which gate of
  * the Gopher filter is decisive — the number that tells you which
  * threshold to tune) and markup stripping (the HTML-removal pass,
  * with injected tags as in the PII batch).
  */
object CurationQueries23 {

  /** RULE ATTRIBUTION — for each of `q_gopher_rules`' four gates
    * (word-count band, mean-word-length band, stopword presence,
    * short-token cap): how many documents fail it at all, and how many
    * fail ONLY it (the sole blocker — exactly the documents a
    * threshold change on that one rule would recover). Sole-blocker
    * counts are the marginal-impact report every filter tuning session
    * starts from; a rule with many total failures but no sole blocks
    * is redundant with the others. Thresholds are literally
    * `q_gopher_rules`' — the two queries cannot drift apart without a
    * red oracle row. SCALE: the q_token_stats explode+agg, then a
    * 1-row fold melted to 4 rows.
    */
  val ruleAttribution: QueryDef = QueryDef.sql(
    "q_rule_attribution",
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |s AS (SELECT doc_id, count(*) AS n_words, sum(length(tok)) AS sum_len,
      |             count(*) FILTER (WHERE length(tok) <= 2) AS n_short,
      |             count(DISTINCT CASE WHEN tok IN ('the','a','of','to','and')
      |                                 THEN tok END) AS n_stop
      |      FROM tk GROUP BY doc_id),
      |r AS (SELECT doc_id,
      |             n_words BETWEEN 25 AND 80 AS p1,
      |             (sum_len * 100) // n_words BETWEEN 420 AND 560 AS p2,
      |             n_stop >= 2 AS p3,
      |             (n_short * 100) // n_words <= 6 AS p4
      |      FROM s),
      |a AS (SELECT count(*) AS nd,
      |             sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS f1,
      |             sum(CASE WHEN NOT p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS s1,
      |             sum(CASE WHEN NOT p2 THEN 1 ELSE 0 END) AS f2,
      |             sum(CASE WHEN NOT p2 AND p1 AND p3 AND p4 THEN 1 ELSE 0 END) AS s2,
      |             sum(CASE WHEN NOT p3 THEN 1 ELSE 0 END) AS f3,
      |             sum(CASE WHEN NOT p3 AND p1 AND p2 AND p4 THEN 1 ELSE 0 END) AS s3,
      |             sum(CASE WHEN NOT p4 THEN 1 ELSE 0 END) AS f4,
      |             sum(CASE WHEN NOT p4 AND p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS s4
      |      FROM r)
      |SELECT rule, CAST(n_fail AS BIGINT) AS n_fail,
      |       CAST(n_sole AS BIGINT) AS n_sole,
      |       CAST(n_sole * 10000 // nd AS BIGINT) AS sole_bp
      |FROM (SELECT 'words' AS rule, f1 AS n_fail, s1 AS n_sole, nd FROM a
      |      UNION ALL SELECT 'mwl', f2, s2, nd FROM a
      |      UNION ALL SELECT 'stopwords', f3, s3, nd FROM a
      |      UNION ALL SELECT 'short_frac', f4, s4, nd FROM a) u""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("tok"))).as("sum_len"),
        count(when(length(col("tok")) <= 2, 1)).as("n_short"),
        countDistinct(when(col("tok").isin("the", "a", "of", "to", "and"),
          col("tok"))).as("n_stop"))
    val r = s.select(
      col("n_words").between(25, 80).as("p1"),
      expr("sum_len * 100 DIV n_words").between(420, 560).as("p2"),
      (col("n_stop") >= 2).as("p3"),
      (expr("n_short * 100 DIV n_words") <= 6).as("p4"))
    r.agg(count(lit(1)).as("nd"),
        sum(when(!col("p1"), 1L).otherwise(0L)).as("f1"),
        sum(when(!col("p1") && col("p2") && col("p3") && col("p4"), 1L).otherwise(0L)).as("s1"),
        sum(when(!col("p2"), 1L).otherwise(0L)).as("f2"),
        sum(when(!col("p2") && col("p1") && col("p3") && col("p4"), 1L).otherwise(0L)).as("s2"),
        sum(when(!col("p3"), 1L).otherwise(0L)).as("f3"),
        sum(when(!col("p3") && col("p1") && col("p2") && col("p4"), 1L).otherwise(0L)).as("s3"),
        sum(when(!col("p4"), 1L).otherwise(0L)).as("f4"),
        sum(when(!col("p4") && col("p1") && col("p2") && col("p3"), 1L).otherwise(0L)).as("s4"))
      .select(expr(
        "stack(4, 'words', f1, s1, 'mwl', f2, s2, 'stopwords', f3, s3, 'short_frac', f4, s4)")
        .as(Seq("rule", "n_fail", "n_sole")), col("nd"))
      .select(col("rule"), col("n_fail"), col("n_sole"),
        expr("n_sole * 10000 DIV nd").as("sole_bp"))
  }

  private val TagPat = """<[^>]+>"""
  private val HrefPat = """href="[^"]*""""

  private val markSql: String =
    "(CASE WHEN doc_id % 6 = 0 THEN '<div class=\"x\"><p>' || text || " +
      "'</p><a href=\"https://example.com/a\">link</a></div>' ELSE text END)"

  private def markCol = when(pmod(col("doc_id"), lit(6L)) === 0,
    concat(lit("<div class=\"x\"><p>"), col("text"),
      lit("</p><a href=\"https://example.com/a\">link</a></div>")))
    .otherwise(col("text"))

  /** MARKUP STRIP — the HTML-removal pass: tag count, link count,
    * characters removed, and the XOR integrity manifest of the
    * stripped release (as `q_redact`). Markup is injected on every 6th
    * document (the fixture is plain text), so the spec can assert the
    * strip is EXACTLY inverse to the injection — stripped output equals
    * the original text for marked docs. SCALE: map-only regex transform
    * + sources-sized aggregate.
    */
  val markupStrip: QueryDef = QueryDef.sql(
    "q_markup_strip",
    s"""WITH a AS (SELECT source, doc_id, $markSql AS aug FROM documents),
       |r AS (SELECT source, aug,
       |  len(regexp_extract_all(aug, '$TagPat')) AS nt,
       |  len(regexp_extract_all(aug, '$HrefPat')) AS nl,
       |  regexp_replace(aug, '$TagPat', '', 'g') AS stripped
       |  FROM a)
       |SELECT source,
       |  CAST(sum(CASE WHEN stripped <> aug THEN 1 ELSE 0 END) AS BIGINT) AS docs_marked,
       |  CAST(sum(nt) AS BIGINT) AS n_tags,
       |  CAST(sum(nl) AS BIGINT) AS n_links,
       |  CAST(sum(length(aug) - length(stripped)) AS BIGINT) AS chars_removed,
       |  CAST(bit_xor(${polyHashSql("stripped")}) AS BIGINT) AS xor_stripped
       |FROM r GROUP BY 1""".stripMargin) { (spark, dir) =>
    val stripped = regexp_replace(markCol, lit(TagPat), lit(""))
    Tables(spark, dir, "documents")
      .select(col("source"), markCol.as("aug"),
        size(regexp_extract_all(markCol, lit(TagPat), lit(0))).cast("long").as("nt"),
        size(regexp_extract_all(markCol, lit(HrefPat), lit(0))).cast("long").as("nl"),
        stripped.as("stripped"))
      .select(col("source"), col("aug"), col("nt"), col("nl"), col("stripped"),
        polyHash(col("stripped")).as("h"))
      .groupBy("source")
      .agg(sum(when(col("stripped") =!= col("aug"), 1L).otherwise(0L)).as("docs_marked"),
        sum("nt").as("n_tags"), sum("nl").as("n_links"),
        sum(length(col("aug")).cast("long") - length(col("stripped"))).as("chars_removed"),
        expr("bit_xor(h)").as("xor_stripped"))
  }

  val all: Seq[QueryDef] = Seq(ruleAttribution, markupStrip)
}
