package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Corpus-indexing / sampling ops over `documents`: inverted-index
  * posting lists and deterministic stratified sampling. Both are built
  * so the per-group work is bounded BEFORE anything is collected — the
  * property that keeps them alive when "documents" is 100 TB.
  */
object CorpusQueries {

  /** Inverted index: token → document frequency + the first 5 postings.
    * The posting head is rank-limited BEFORE `collect_list` (Spark turns
    * the `row_number ≤ 5` filter into a map-side WindowGroupLimit), so
    * at most 5 doc ids per token ever cross the shuffle or enter an
    * array — an unbounded `collect_list(doc_id)` on a stopword token
    * would otherwise materialize millions of ids in one row.
    */
  val postings: QueryDef = QueryDef.sql(
    "q_postings",
    """WITH toks AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE tok <> ''),
      |head AS (
      |  SELECT tok, doc_id FROM (
      |    SELECT tok, doc_id,
      |           row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
      |    FROM toks) WHERE rn <= 5)
      |SELECT d.tok, d.df, h.posting_head
      |FROM (SELECT tok, count(*) AS df FROM toks GROUP BY tok) d
      |JOIN (SELECT tok, array_to_string(list_sort(list(doc_id)), ',') AS posting_head
      |      FROM head GROUP BY tok) h USING (tok)""".stripMargin) { (spark, dir) =>
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val head = toks
      .withColumn("rn",
        row_number().over(Window.partitionBy("tok").orderBy("doc_id")))
      .filter(col("rn") <= 5)
      .groupBy("tok").agg(
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("posting_head"))
    dfreq.join(head, "tok")
  }

  /** Deterministic stratified sample: exactly k=10 documents per
    * language, chosen by a multiplicative-hash order (Knuth constant) so
    * the pick is stable under re-sharding and identical in both engines
    * — integer algebra, no RNG. The `rank ≤ k` filter again runs as a
    * map-side WindowGroupLimit: only ~k rows per stratum reach the
    * shuffle regardless of corpus size.
    */
  val stratifiedK: QueryDef = QueryDef.sql(
    "q_stratified_k",
    """WITH r AS (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang
      |                            ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
      |FROM r WHERE rn <= 10""".stripMargin) { (spark, dir) =>
    val order = (col("doc_id") * lit(2654435761L)) % lit(4294967296L)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        row_number().over(
          Window.partitionBy("lang").orderBy(order, col("doc_id"))).as("rn"))
      .filter(col("rn") <= 10)
      // row_number is INT in Spark, BIGINT in DuckDB — BIGINT on both
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
  }

  /** Sliding token windows (size 16, stride 8) with a polynomial
    * fingerprint per window — how long documents become fixed-length
    * training samples, and the unit for window-level dedup/decontam
    * (the fingerprint is the join key). MAP-ONLY: windows are built
    * per row from the token array (`transform(sequence(...))` +
    * `slice`), nothing shuffles; the last window is short rather than
    * padded, both engines clip slices identically.
    */
  val tokenWindows: QueryDef = QueryDef.sql(
    "q_token_windows", {
      import graft.functions.TextFunctions.polyHashSql
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |w AS (SELECT doc_id, w, toks[w*8+1 : w*8+16] AS win
         |      FROM tk, unnest(range(0, (len(toks) + 7) // 8)) t(w))
         |SELECT doc_id, CAST(w AS BIGINT) AS win_idx,
         |       CAST(w*8 AS BIGINT) AS start_tok,
         |       CAST(len(win) AS BIGINT) AS n_tok,
         |       ${polyHashSql("array_to_string(win, ' ')")} AS fp
         |FROM w""".stripMargin
    }) { (spark, dir) =>
    import graft.functions.TextFunctions.{polyHash, tokens}
    // tokens() materialized once per row — slice inside the lambda would
    // otherwise re-tokenize per window (O(L^2/8) in document length)
    val toks = col("toks")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(transform(
        // windows w = 0 .. floor((n-1)/8)  (== ceil(n/8)-1; n >= 1 always)
        sequence(lit(0), ((size(toks) - 1) / lit(8)).cast("int")),
        w => struct(w.cast("long").as("win_idx"),
          (w * 8).cast("long").as("start_tok"),
          slice(toks, w * 8 + 1, lit(16)).as("win")))).as("x"))
      .select(col("doc_id"), col("x.win_idx").as("win_idx"),
        col("x.start_tok").as("start_tok"),
        size(col("x.win")).cast("long").as("n_tok"),
        polyHash(array_join(col("x.win"), " ")).as("fp"))
  }

  /** One-row corpus report card — the summary a curation run logs per
    * snapshot: document count, exact-duplicate count, token volume,
    * vocabulary size, mean tokens/doc. All integer aggregates (the mean
    * is one double division of two exact BIGINTs), so the row is
    * bit-stable across engines and partitionings.
    */
  val corpusStats: QueryDef = QueryDef.sql(
    "q_corpus_stats",
    """WITH d AS (SELECT count(*) AS n_docs,
      |                  count(*) - count(DISTINCT text) AS n_dup_docs,
      |                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |           FROM documents),
      |v AS (SELECT count(DISTINCT tok) AS vocab FROM (
      |        SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |      WHERE tok <> '')
      |SELECT d.n_docs, d.n_dup_docs, d.n_tokens, v.vocab,
      |       CAST(d.n_tokens AS DOUBLE) / d.n_docs AS mean_tokens
      |FROM d, v""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    val d = docs.agg(
      count(lit(1)).as("n_docs"),
      (count(lit(1)) - countDistinct(col("text"))).as("n_dup_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val v = docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .agg(countDistinct(col("tok")).as("vocab"))
    d.crossJoin(v)
      .withColumn("mean_tokens", col("n_tokens").cast("double") / col("n_docs"))
  }

  val all: Seq[QueryDef] = Seq(postings, stratifiedK, tokenWindows, corpusStats)
}
