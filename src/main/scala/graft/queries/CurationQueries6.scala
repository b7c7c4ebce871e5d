package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql}

/** Sixth curation batch — the shard/packing/vocabulary bookkeeping a
  * training-data pipeline runs after curation and before the trainer
  * reads a byte: deterministic shard balance, context-window packing
  * waste, and top-k vocabulary coverage. All integer arithmetic
  * (basis-point ratios of exact counts), so both engines agree bit-wise.
  */
object CurationQueries6 {

  /** Deterministic hash-shard assignment balance — the re-shard step
    * that fans the corpus out to training workers: shard = salted
    * content-independent hash of doc_id mod 32 (id-keyed, so a re-crawl
    * with different text lands on the same shard — the same
    * `q_sample_split` salted-hash discipline), reported as per-shard
    * doc/token volume with deviation from the uniform ideal in basis
    * points. Map-side assignment inside the scan + one 32-group
    * aggregate + a broadcast total: nothing here changes shape at
    * 100 TB, which is the point — the report EXISTS to prove the
    * assignment stays balanced when the corpus grows.
    */
  val shardAssign: QueryDef = QueryDef.sql(
    "q_shard_assign",
    s"""WITH m AS (SELECT ${polyHashSql("'shard|' || CAST(doc_id AS VARCHAR)")} % 32 AS shard,
       |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |           FROM documents),
       |s AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |             CAST(sum(n) AS BIGINT) AS tot_tokens
       |      FROM m GROUP BY shard),
       |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
       |             CAST(sum(tot_tokens) AS BIGINT) AS tt FROM s)
       |SELECT s.shard, s.n_docs, s.tot_tokens,
       |       CAST(floor(abs(s.n_docs * 32 - t.td) * 10000.0 / t.td) AS BIGINT) AS doc_dev_bp,
       |       CAST(floor(abs(s.tot_tokens * 32 - t.tt) * 10000.0 / t.tt) AS BIGINT) AS tok_dev_bp
       |FROM s, t""".stripMargin) { (spark, dir) =>
    val m = Tables(spark, dir, "documents")
      .select((polyHash(concat(lit("shard|"), col("doc_id").cast("string"))) % 32).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val s = m.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tot_tokens"))
    val t = s.agg(sum(col("n_docs")).as("td"), sum(col("tot_tokens")).as("tt"))
    s.crossJoin(broadcast(t))
      .select(col("shard"), col("n_docs"), col("tot_tokens"),
        floor(abs(col("n_docs") * 32 - col("td")) * 10000.0 / col("td"))
          .cast("long").as("doc_dev_bp"),
        floor(abs(col("tot_tokens") * 32 - col("tt")) * 10000.0 / col("tt"))
          .cast("long").as("tok_dev_bp"))
  }

  /** Context-window packing waste — the padding-overhead report that
    * motivates sequence packing: each document occupies
    * ⌈tokens/512⌉ training sequences (one doc per sequence, padded),
    * and the per-source waste is what a packer would reclaim. Integral
    * DIV throughout; map-only measure + one source-sized aggregate.
    */
  val packingWaste: QueryDef = QueryDef.sql(
    "q_packing_waste",
    """WITH m AS (SELECT source,
      |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |                  CAST((len(string_split(text, ' ')) + 511) // 512 AS BIGINT) AS seqs
      |           FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n) AS BIGINT) AS tot_tokens,
      |       CAST(sum(seqs) AS BIGINT) AS n_seqs,
      |       CAST(sum(seqs) * 512 - sum(n) AS BIGINT) AS pad_tokens,
      |       CAST(floor((sum(seqs) * 512 - sum(n)) * 10000.0 / (sum(seqs) * 512))
      |            AS BIGINT) AS pad_bp
      |FROM m GROUP BY source""".stripMargin) { (spark, dir) =>
    val n = size(split(col("text"), " ")).cast("long")
    Tables(spark, dir, "documents")
      .select(col("source"), n.as("n"))
      .select(col("source"), col("n"), expr("(n + 511) DIV 512").as("seqs"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tot_tokens"),
        sum(col("seqs")).as("n_seqs"))
      .select(col("source"), col("n_docs"), col("tot_tokens"), col("n_seqs"),
        (col("n_seqs") * 512 - col("tot_tokens")).as("pad_tokens"),
        floor((col("n_seqs") * 512 - col("tot_tokens")) * 10000.0
          / (col("n_seqs") * 512)).cast("long").as("pad_bp"))
  }

  /** Top-k vocabulary coverage — the tokenizer-sizing curve: the 20 most
    * frequent tokens with each rank's cumulative share of ALL token
    * occurrences in basis points ("how much of the corpus do k vocab
    * entries buy"). The top-k is a heap merge (`TakeOrderedAndProject`,
    * never a global sort); the cumulative window rides the 20-row
    * result; the denominator is one broadcast scalar.
    *
    * TOKENIZE ONCE (the round-8 exchange-reuse item): the denominator
    * is Σcnt over the per-token count table, NOT a second count over
    * the raw token stream — both consumers hang off the SAME
    * `groupBy(tok)` aggregation, so the corpus-sized scan+tokenize+
    * partial-agg map side runs once and the second consumer reads the
    * vocab-sized shuffle output through a ReusedExchange (gated in
    * PlanShapeSpec). The old shape scanned and tokenized the corpus
    * twice — a 2x constant at every scale.
    */
  val vocabCoverage: QueryDef = QueryDef.sql(
    "q_vocab_coverage",
    """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY tok),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM c),
      |top AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rnk,
      |       tok, cnt,
      |       CAST(floor(sum(cnt) OVER (ORDER BY cnt DESC, tok) * 10000.0 / t.tot)
      |            AS BIGINT) AS cum_bp
      |FROM top, t""".stripMargin) { (spark, dir) =>
    val counts = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val t = counts.agg(sum(col("cnt")).as("tot"))
    val top = counts.orderBy(col("cnt").desc, col("tok").asc).limit(20)
    val w = Window.orderBy(col("cnt").desc, col("tok").asc)
    top.crossJoin(broadcast(t))
      .select(row_number().over(w).cast("long").as("rnk"), col("tok"), col("cnt"),
        floor(sum(col("cnt")).over(w) * 10000.0 / col("tot")).cast("long").as("cum_bp"))
  }

  /** Dedup survivorship by provenance — which sources LOSE the most to
    * exact dedup: per source, documents in vs. keepers out (keeper =
    * min-id representative of each text group, the collapse-first
    * convention). A feed whose keep rate craters is re-crawling content
    * some other feed already supplied — the signal that reweights or
    * drops it. One content-key groupBy + one id equi-join + a
    * source-sized rollup.
    */
  val dedupSurvivorship: QueryDef = QueryDef.sql(
    "q_dedup_survivorship",
    """WITH g AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY text)
      |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(g.keep_id) AS BIGINT) AS n_kept,
      |       CAST(floor(count(g.keep_id) * 10000.0 / count(*)) AS BIGINT) AS keep_bp
      |FROM documents d LEFT JOIN g ON g.keep_id = d.doc_id
      |GROUP BY d.source""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    // narrow content-key group (Dedup.contentKey discipline) and a
    // narrow (doc_id, source) probe side — text never enters a shuffle
    val keepers = docs
      .select(col("doc_id"), graft.operators.Dedup.contentKey(col("text")).as("ck"))
      .groupBy("ck").agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id"), lit(1).as("kept"))
    docs.select(col("doc_id"), col("source"))
      .join(keepers, col("keep_id") === col("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), count(col("kept")).as("n_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        floor(col("n_kept") * 10000.0 / col("n_docs")).cast("long").as("keep_bp"))
  }

  /** Vocabulary growth curve (Heaps-law dashboard) — the corpus split
    * into 10 id-ordered slices, each reporting its token volume, the
    * number of NEVER-SEEN-BEFORE token types it introduces, and the
    * cumulative vocabulary. Sub-linear growth is healthy natural text;
    * a late slice that mints types linearly is machine noise or an
    * encoding break. "First slice that contains each type" is one
    * min-aggregate over the token table — corpus-linear, no ordering
    * pass; the cumulative sum rides the 10-row result.
    */
  val vocabGrowth: QueryDef = QueryDef.sql(
    "q_vocab_growth",
    """WITH b AS (SELECT CAST(least(9, doc_id * 10 // (SELECT max(doc_id) + 1 FROM documents))
      |                       AS BIGINT) AS bucket,
      |                  string_split(text, ' ') AS toks
      |           FROM documents),
      |tk AS (SELECT bucket, unnest(toks) AS tok FROM b),
      |vol AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens FROM tk GROUP BY bucket),
      |fs AS (SELECT tok, min(bucket) AS first_bucket FROM tk GROUP BY tok),
      |nt AS (SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS new_types
      |       FROM fs GROUP BY first_bucket)
      |SELECT v.bucket, v.n_tokens,
      |       CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types,
      |       CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY v.bucket) AS BIGINT)
      |         AS cum_vocab
      |FROM vol v LEFT JOIN nt ON nt.bucket = v.bucket""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    val maxId = docs.agg(max(col("doc_id")).as("mx"))
    val tk = docs.crossJoin(broadcast(maxId))
      .select(expr("least(9, doc_id * 10 DIV (mx + 1))").cast("long").as("bucket"),
        explode(split(col("text"), " ")).as("tok"))
    val vol = tk.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val nt = tk.groupBy("tok").agg(min(col("bucket")).as("first_bucket"))
      .groupBy(col("first_bucket").as("nbucket"))
      .agg(count(lit(1)).as("new_types"))
    vol.join(nt, col("nbucket") === col("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_vocab",
        sum(col("new_types")).over(Window.orderBy(col("bucket"))))
  }

  val all: Seq[QueryDef] = Seq(shardAssign, packingWaste, vocabCoverage,
    dedupSurvivorship, vocabGrowth)
}
