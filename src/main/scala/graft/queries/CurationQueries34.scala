package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql, tokens}

/** Thirty-fourth curation batch (round 11): the dedup collision audit
  * as a checked query, tokenizer fertility by language, and the
  * token-budget mixing planner — the "how many epochs of each source"
  * table a pretraining run is configured from.
  */
object CurationQueries34 {

  private val Q20 = 1048576L

  /** DEDUP COLLISION AUDIT — [[graft.operators.Dedup.collisionAudit]]
    * as an oracle-checked query: group the corpus by a hash key and
    * emit every group whose members are NOT byte-identical (min(text)
    * ≠ max(text) is the witness). Here the key is DELIBERATELY narrow
    * (polyhash mod 64) so the fixture actually produces collisions and
    * the oracle checks the audit's detection logic end-to-end; the
    * production pass runs the same operator over the 192-bit
    * [[graft.operators.Dedup.contentKey]], where an empty result
    * certifies that hash-keyed "exact" dedup was byte-exact on this
    * corpus (the hostile-input caveat's verify tier; DedupSpec pins
    * the empty case under the real key). SCALE: one keyed aggregate;
    * raw text crosses the exchange once as min/max agg payload —
    * two strings of partial state per key per partition.
    */
  val dedupAudit: QueryDef = QueryDef.sql(
    "q_dedup_audit",
    s"""WITH k AS (SELECT ${polyHashSql("text")} % 64 AS k, text FROM documents)
       |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_docs
       |FROM k GROUP BY k HAVING min(text) <> max(text)""".stripMargin) { (spark, dir) =>
    graft.operators.Dedup.collisionAudit(
      Tables(spark, dir, "documents"), polyHash(col("text")) % 64, "text")
      .select(col("k").cast("long").as("k"), col("n_docs"))
  }

  /** TOKENIZER FERTILITY BY LANGUAGE — tokens-per-word after applying
    * the learned merge table, per language (Q20 grid). Fertility is
    * the standard tokenizer-eval metric: a tokenizer trained on a
    * skewed mix over-fragments the under-represented languages, and
    * this table is where that shows up. (This engine's BPE merges
    * whitespace words UPWARD into super-word tokens, so fertility_q
    * sits at or below 2^20 — same metric, compression direction; a
    * sub-word BPE reads above it.) Training is the memoized merge
    * loop; the apply is ONE map-side fold pass and the only exchange
    * carries |languages| rows.
    */
  val bpeFertility: QueryDef = {
    val iters = TextStatsQueries.BpeIters
    QueryDef.sql(
      "q_bpe_fertility",
      s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |${TextStatsQueries.bpeRoundCtes(iters)},
         |w AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_words,
         |             CAST(sum(len(t.toks)) AS BIGINT) AS n_tok
         |      FROM t$iters t JOIN documents d USING (doc_id)
         |      GROUP BY d.lang)
         |SELECT lang, n_docs, n_words, n_tok,
         |       n_tok * $Q20 // n_words AS fertility_q
         |FROM w""".stripMargin) { (spark, dir) =>
      val merges = TextStatsQueries.learnedMergeRows(spark, dir, iters)
        .map { case (_, l, r, _, _) => (l, r) }
      Tables(spark, dir, "documents")
        .select(col("lang"),
          size(tokens(col("text"))).cast("long").as("n_words"),
          size(merges.foldLeft(tokens(col("text"))) { case (c, (l, r)) =>
            graft.functions.HashExpressions.bpeMergeFast(c, l, r)
          }).cast("long").as("n_tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").cast("long").as("n_words"),
          sum("n_tok").cast("long").as("n_tok"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tok"),
          expr(s"n_tok * $Q20 DIV n_words").as("fertility_q"))
    }
  }

  /** TOKEN-BUDGET MIXING PLANNER — the table a pretraining run is
    * configured from: given the corpus's per-source token inventory
    * and a temperature-flattened target mix (weight ∝ √tokens, the
    * `q_temperature_mix` rule applied to TOKENS, which is what a
    * budget is denominated in), plan a half-corpus token budget
    * B = Σtokens / 2 and emit per source its target token allocation
    * and the implied EPOCH count (Q20): epochs_q > 2^20 means the
    * source is upsampled past one pass — the low-resource repetition
    * knob made explicit, exactly the number a data loader needs.
    * Pure integer algebra on a |sources|-row frame after one corpus
    * aggregate.
    */
  val mixEpochs: QueryDef = QueryDef.sql(
    "q_mix_epochs",
    s"""WITH s AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
       |           FROM documents GROUP BY source),
       |w AS (SELECT source, avail,
       |             CAST(floor(sqrt(CAST(avail AS DOUBLE)) * $Q20) AS BIGINT) AS wq
       |      FROM s),
       |t AS (SELECT CAST(sum(avail) AS BIGINT) AS tot, CAST(sum(wq) AS BIGINT) AS wtot FROM w)
       |SELECT w.source, w.avail,
       |       CAST(w.wq * 10000 // t.wtot AS BIGINT) AS share_bp,
       |       CAST((t.tot // 2) * w.wq // t.wtot AS BIGINT) AS target_tokens,
       |       CAST(((t.tot // 2) * w.wq // t.wtot) * $Q20 // w.avail AS BIGINT) AS epochs_q
       |FROM w, t""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(sum(size(tokens(col("text"))).cast("long")).as("avail"))
    val w = s.select(col("source"), col("avail"),
      floor(sqrt(col("avail").cast("double")) * Q20).cast("long").as("wq"))
    val t = w.agg(sum("avail").cast("long").as("tot"), sum("wq").cast("long").as("wtot"))
    w.crossJoin(broadcast(t))
      .select(col("source"), col("avail"),
        expr("wq * 10000 DIV wtot").as("share_bp"),
        expr("(tot DIV 2) * wq DIV wtot").as("target_tokens"),
        expr("((tot DIV 2) * wq DIV wtot) * 1048576 DIV avail").as("epochs_q"))
  }

  val all: Seq[QueryDef] = Seq(dedupAudit, bpeFertility, mixEpochs)
}
