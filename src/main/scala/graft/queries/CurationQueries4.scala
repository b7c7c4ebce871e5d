package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHashSql, shinglesSql}
import graft.operators.Dedup

/** Fourth curation batch: vocabulary coverage (OOV rate), inter-document
  * n-gram duplication fraction (the Gopher-style repetition signal
  * measured ACROSS documents, complementing `q_repetition`'s
  * within-document form), blocklist filtering, and per-dimension
  * embedding distribution stats (the embedding-QA pass a pipeline runs
  * before any ANN indexing). Determinism discipline matches the ledger:
  * ratios are integer basis points and every mean/variance rides the
  * fixed-point grids (2^52 for values, 2^45 for squares) so the
  * aggregations are exact integer sums in both engines.
  */
object CurationQueries4 {

  private val S52 = "4503599627370496.0" // 2^52 value grid
  private val S52d = 4503599627370496.0
  private val S45 = "35184372088832.0" // 2^45 square grid
  private val S45d = 35184372088832.0

  /** Out-of-vocabulary rate per document against a corpus-derived top-20
    * token vocabulary — the tokenizer-coverage check run before training
    * (a doc full of unknown tokens is noise or the wrong language). The
    * vocabulary is a global top-k (`TakeOrderedAndProject`: per-partition
    * heap, no global sort) and is broadcast against the exploded token
    * table — at production scale the vocab is KB–MB-sized regardless of
    * corpus size, so the coverage pass stays a map-side join plus one
    * keyed aggregation.
    */
  val oovRate: QueryDef = QueryDef.sql(
    "q_oov_rate",
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |v AS (SELECT tok AS vtok FROM (
      |        SELECT tok, count(*) AS cnt FROM tk GROUP BY tok
      |        ORDER BY cnt DESC, tok LIMIT 20)),
      |j AS (SELECT tk.doc_id, v.vtok FROM tk LEFT JOIN v ON v.vtok = tk.tok)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |       CAST(floor(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) * 10000.0
      |                  / count(*)) AS BIGINT) AS oov_bp
      |FROM j GROUP BY doc_id""".stripMargin) { (spark, dir) =>
    val tk = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(20)
      .select(col("tok").as("vtok"))
    tk.join(broadcast(vocab), col("vtok") === col("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("vtok").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        floor(col("n_oov") * 10000.0 / col("n_tokens")).cast("long").as("oov_bp"))
  }

  /** Inter-document duplicate-n-gram fraction: for each document, the
    * share of its distinct 5-gram fingerprints that occur in at least one
    * OTHER document — the corpus-level repetition/boilerplate signal
    * (Gopher's "fraction of duplicated n-grams", measured exactly). Two
    * keyed aggregations over the shingle-hash table plus one self-join on
    * the 61-bit hash key; the join co-partitions on `h`, so the heavy
    * side shuffles once and the df table is vocabulary-sized.
    */
  val dupNgramFrac: QueryDef = QueryDef.sql(
    "q_dup_ngram_frac",
    s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql("string_split(text, ' ')", 5)}) AS s
       |            FROM documents),
       |hs AS (SELECT DISTINCT doc_id, ${polyHashSql("s")} AS h FROM sh),
       |dfh AS (SELECT h, count(*) AS df, min(doc_id) AS owner FROM hs GROUP BY h),
       |uniq AS (SELECT owner AS doc_id, count(*) AS n_uniq FROM dfh WHERE df = 1 GROUP BY owner),
       |tot AS (SELECT doc_id, count(*) AS n_shingles FROM hs GROUP BY doc_id)
       |SELECT d.doc_id, CAST(coalesce(t.n_shingles, 0) AS BIGINT) AS n_shingles,
       |       CAST(coalesce(t.n_shingles, 0) - coalesce(u.n_uniq, 0) AS BIGINT) AS n_dup,
       |       CAST(CASE WHEN t.n_shingles IS NULL THEN 0
       |            ELSE floor((t.n_shingles - coalesce(u.n_uniq, 0)) * 10000.0
       |                       / t.n_shingles) END AS BIGINT) AS dup_bp
       |FROM documents d LEFT JOIN tot t ON t.doc_id = d.doc_id
       |     LEFT JOIN uniq u ON u.doc_id = d.doc_id""".stripMargin) { (spark, dir) =>
    // n_dup = n_shingles − (hashes this doc is the SOLE owner of): the df
    // aggregation carries min(doc_id), so singleton hashes flow back to
    // their document as a second aggregation and the final join is
    // DOC-sized, not shingle-sized (the shingle-table self-join loses its
    // broadcast at scale and goes sort-merge — measured slope 1.9 at 10x
    // for the join form vs ~0.5 for this one). The report is anchored on
    // `documents`, not on the shingle table: a doc under 5 tokens emits
    // zero shingles and would otherwise vanish from the output.
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    val hs = Dedup.shingleHashTable(Tables(spark, dir, "documents"), "doc_id", "text", 5)
      .distinct()
    val dfh = hs.groupBy("h")
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
    val uniq = dfh.filter(col("df") === 1)
      .groupBy(col("owner").as("udoc")).agg(count(lit(1)).as("n_uniq"))
    val tot = hs.groupBy(col("doc_id").as("tdoc")).agg(count(lit(1)).as("n_shingles"))
    docs
      .join(tot, col("tdoc") === col("doc_id"), "left")
      .join(uniq, col("udoc") === col("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        (coalesce(col("n_shingles"), lit(0L)) - coalesce(col("n_uniq"), lit(0L))).as("n_dup"),
        when(col("n_shingles").isNull, 0L)
          .otherwise(floor((col("n_shingles") - coalesce(col("n_uniq"), lit(0L))) * 10000.0
            / col("n_shingles")).cast("long")).as("dup_bp"))
  }

  /** Blocklist filter — per-document hit counts against a fixed term
    * list, the safety/compliance gate of a curation run. The list is a
    * literal IN (a map-side set probe inside the scan: no shuffle, no
    * join); a production-sized blocklist (10k+ terms) rides the same
    * shape with the set broadcast instead of inlined, which is exactly
    * how `q_oov_rate`'s vocabulary side is planned.
    */
  val blocklist: QueryDef = QueryDef.sql(
    "q_blocklist",
    """WITH m AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_filter(string_split(text, ' '),
      |                              t -> t IN ('slow', 'crash', 'deprecated'))) AS BIGINT) AS n_hits,
      |         CAST(len(list_filter(list_distinct(string_split(text, ' ')),
      |                              t -> t IN ('slow', 'crash', 'deprecated'))) AS BIGINT) AS n_terms
      |  FROM documents)
      |SELECT doc_id, n_tokens, n_hits, n_terms, n_hits = 0 AS keep FROM m""".stripMargin) {
    (spark, dir) =>
      val blocked = Seq("slow", "crash", "deprecated")
      val toks = split(col("text"), " ")
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(filter(toks, t => t.isin(blocked: _*))).cast("long").as("n_hits"),
          size(filter(array_distinct(toks), t => t.isin(blocked: _*))).cast("long")
            .as("n_terms"))
        .withColumn("keep", col("n_hits") === 0L)
  }

  /** Per-dimension embedding distribution profile: n, mean, variance,
    * min, max for each of the 64 dimensions — the embedding-QA pass that
    * catches dead dimensions, saturation, and scale drift before any
    * index is built on top. Means ride the 2^52 grid and squares the
    * 2^45 grid (exact integer sums, order-independent), divided by the
    * same constants in both engines so the emitted doubles are
    * bit-identical. One posexplode plus a 64-group aggregation with
    * map-side partials: at any corpus size the shuffle carries 64 rows
    * per partition.
    */
  val embedDimStats: QueryDef = QueryDef.sql(
    "q_embed_dim_stats",
    s"""WITH ed AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       |            FROM embeddings, UNNEST(range(1, 65)) t(i)),
       |g AS (SELECT i, count(*) AS n,
       |             CAST(sum(CAST(floor(x * $S52) AS BIGINT)) AS DOUBLE) / $S52 / count(*) AS mean,
       |             CAST(sum(CAST(floor(x * x * $S45) AS BIGINT)) AS DOUBLE) / $S45 / count(*) AS ex2,
       |             min(x) AS vmin, max(x) AS vmax
       |      FROM ed GROUP BY i)
       |SELECT i, CAST(n AS BIGINT) AS n_vecs, mean, ex2 - mean * mean AS var, vmin, vmax
       |FROM g""".stripMargin) { (spark, dir) =>
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select((col("i0") + 1).cast("long").as("i"), col("x"))
      .groupBy("i")
      .agg(count(lit(1)).as("n_vecs"),
        (sum(floor(col("x") * S52d).cast("long")).cast("double") / S52d / count(lit(1)))
          .as("mean"),
        (sum(floor(col("x") * col("x") * S45d).cast("long")).cast("double") / S45d
          / count(lit(1))).as("ex2"),
        min(col("x")).as("vmin"), max(col("x")).as("vmax"))
      .select(col("i"), col("n_vecs"), col("mean"),
        (col("ex2") - col("mean") * col("mean")).as("var"), col("vmin"), col("vmax"))
  }

  val all: Seq[QueryDef] = Seq(oovRate, dupNgramFrac, blocklist, embedDimStats)
}
