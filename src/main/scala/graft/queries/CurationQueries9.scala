package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql, tokens}

/** Ninth curation batch — corpus-selection and placement operators a
  * large-scale training pipeline runs between dedup and sharding:
  * DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"), the Gopher rule
  * filter (Rae et al. 2021 §A1.1), rendezvous (HRW) sharding with a
  * measured resize-churn bound, per-source unigram KL drift, and
  * distinct-n-gram diversity. Determinism discipline as everywhere:
  * integer counts, hash-derived randomness, ln terms floor-quantized
  * onto the 2^40 grid (the `q_psi` pattern) so both engines agree
  * bit-for-bit.
  */
object CurationQueries9 {

  private val Q40 = "1099511627776.0" // 2^40, the repo's ln-term grid

  /** DSIR — hashed-bigram importance weights for target-distribution
    * selection: treat sources src0-src4 as the "target" (curated) set,
    * the whole corpus as "raw", featurize every document by its
    * adjacent-token bigrams hashed onto 1024 buckets, and score each
    * document by the summed log-likelihood-ratio of its bigram
    * occurrences under the two smoothed bucket distributions. Top-20
    * by score = the raw documents that look most target-like — the
    * published recipe's selection step with resampling replaced by
    * deterministic top-k (RNG-free, rerun-stable).
    *
    * SCALE: bigram emission is map-side; bucket stats are a
    * 1024-bounded aggregate; the weight table broadcasts (1024 rows);
    * the per-doc score is one corpus-shaped doc-keyed sum; top-20 is
    * TakeOrderedAndProject. Nothing pairwise, nothing corpus-global
    * but the two scalar totals.
    */
  val dsir: QueryDef = QueryDef.sql(
    "q_dsir",
    s"""WITH tk AS (SELECT doc_id,
       |                  source IN ('src0','src1','src2','src3','src4') AS tgt,
       |                  string_split(text, ' ') AS toks FROM documents),
       |big AS (SELECT doc_id, tgt,
       |               ${polyHashSql("toks[i] || ' ' || toks[i+1]")} % 1024 AS b
       |        FROM tk, unnest(range(1, len(toks))) u(i)),
       |tc AS (SELECT b, count(*) FILTER (WHERE tgt) AS ct, count(*) AS cr
       |       FROM big GROUP BY b),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
       |        FROM tc),
       |w AS (SELECT b, CAST(floor(ln(((ct + 1) * 1.0 / (nt + 1024))
       |                             / ((cr + 1) * 1.0 / (nr + 1024))) * $Q40)
       |                 AS BIGINT) AS wq
       |      FROM tc, tot),
       |ds AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |              CAST(sum(wq) AS BIGINT) AS score_q40
       |       FROM big JOIN w USING (b) GROUP BY doc_id)
       |SELECT doc_id, n_bigrams, score_q40 FROM ds
       |ORDER BY score_q40 DESC, doc_id LIMIT 20""".stripMargin) { (spark, dir) =>
    val big = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        col("source").isin("src0", "src1", "src2", "src3", "src4").as("tgt"),
        tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("tgt"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")).as("bg"))
      .select(col("doc_id"), col("tgt"), pmod(polyHash(col("bg")), lit(1024L)).as("b"))
      // bucketed bigram frame feeds the 1024-bucket stats AND the
      // per-doc score join — one explode pass, not two (round 16;
      // durability: round-12 ledger class)
      .localCheckpoint()
    val tc = big.groupBy("b")
      .agg(count(when(col("tgt"), 1)).as("ct"), count(lit(1)).as("cr"))
    val tot = tc.agg(sum("ct").cast("long").as("nt"), sum("cr").cast("long").as("nr"))
    val w = tc.crossJoin(broadcast(tot)).select(col("b"),
      floor(log(((col("ct") + 1) * lit(1.0) / (col("nt") + 1024))
        / ((col("cr") + 1) * lit(1.0) / (col("nr") + 1024))) * expr(Q40))
        .cast("long").as("wq"))
    big.join(broadcast(w), "b").groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("wq").cast("long").as("score_q40"))
      .orderBy(col("score_q40").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), col("n_bigrams"), col("score_q40"))
  }

  /** GOPHER RULE FILTER — the published rule set re-expressed over
    * this corpus's measurable axes: word-count bounds, mean-word-length
    * band, ≥2 distinct stopwords present, and a short-token-fraction
    * cap (the symbol/ellipsis rules have no signal in a
    * space-separated-word fixture and are omitted). Emits the per-rule
    * inputs alongside the verdict so the filter is auditable, not just
    * a boolean. All-integer: scaled ratios via DIV, no doubles.
    *
    * SCALE: one token explode + one doc-keyed aggregate — the same
    * shape as `q_token_stats`; rule evaluation is map-side arithmetic
    * on the aggregate row.
    */
  val gopherRules: QueryDef = QueryDef.sql(
    "q_gopher_rules",
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |s AS (SELECT doc_id, count(*) AS n_words, sum(length(tok)) AS sum_len,
      |             count(*) FILTER (WHERE length(tok) <= 2) AS n_short,
      |             count(DISTINCT CASE WHEN tok IN ('the','a','of','to','and')
      |                                 THEN tok END) AS n_stop
      |      FROM tk GROUP BY doc_id)
      |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      |       CAST((sum_len * 100) // n_words AS BIGINT) AS mwl_x100,
      |       CAST(n_stop AS BIGINT) AS n_stop,
      |       CAST((n_short * 100) // n_words AS BIGINT) AS short_x100,
      |       CAST(CASE WHEN n_words BETWEEN 25 AND 80
      |                  AND (sum_len * 100) // n_words BETWEEN 420 AND 560
      |                  AND n_stop >= 2
      |                  AND (n_short * 100) // n_words <= 6
      |             THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM s""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("tok"))).as("sum_len"),
        count(when(length(col("tok")) <= 2, 1)).as("n_short"),
        countDistinct(when(col("tok").isin("the", "a", "of", "to", "and"),
          col("tok"))).as("n_stop"))
    s.select(col("doc_id"), col("n_words"),
      expr("sum_len * 100 DIV n_words").as("mwl_x100"),
      col("n_stop").cast("long").as("n_stop"),
      expr("n_short * 100 DIV n_words").as("short_x100"),
      (col("n_words").between(25, 80) &&
        expr("sum_len * 100 DIV n_words").between(420, 560) &&
        col("n_stop") >= 2 &&
        expr("n_short * 100 DIV n_words") <= 6).cast("long").as("keep"))
  }

  /** RENDEZVOUS (HRW) SHARDING with a measured resize-churn bound: each
    * document goes to the shard with the highest hash(doc, shard) —
    * the assignment that stays put for all but ~1/(n+1) of keys when a
    * shard is added (vs `pmod`, which moves nearly everything). The
    * query computes both the 16-shard and 17-shard assignments and
    * reports per-shard counts plus how many documents MOVED — the
    * consistent-hashing guarantee as a measurable row, not a claim
    * (expected moved/total ≈ 1/17 ≈ 5.9%).
    *
    * SCALE: the argmax over 17 hashes is a map-side `aggregate` HOF
    * fold per document (no explode, no shuffle); the two shard
    * aggregates are 17-bounded. At 100 TB this is exactly how a
    * re-sharding plan is priced before moving a byte.
    */
  val rendezvousShard: QueryDef = QueryDef.sql(
    "q_rendezvous_shard",
    s"""WITH hx AS (SELECT doc_id, s,
       |                  ${polyHashSql("CAST(s AS VARCHAR) || '#' || CAST(doc_id AS VARCHAR)")} AS x
       |           FROM documents, unnest(range(0, 17)) u(s)),
       |hw AS (SELECT doc_id, s, (x * x) % 1000000007 AS w FROM hx),
       |m AS (SELECT doc_id, max(w) FILTER (WHERE s < 16) AS m16, max(w) AS m17
       |      FROM hw GROUP BY doc_id),
       |a AS (SELECT hw.doc_id,
       |             min(CASE WHEN s < 16 AND w = m16 THEN s END) AS a16,
       |             min(CASE WHEN w = m17 THEN s END) AS a17
       |      FROM hw JOIN m USING (doc_id) GROUP BY hw.doc_id),
       |c16 AS (SELECT a16 AS shard, count(*) AS n16 FROM a GROUP BY 1),
       |c17 AS (SELECT a17 AS shard, count(*) AS n17,
       |               count(*) FILTER (WHERE a16 <> a17) AS n_moved
       |        FROM a GROUP BY 1)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |       CAST(coalesce(n16, 0) AS BIGINT) AS n16,
       |       CAST(coalesce(n17, 0) AS BIGINT) AS n17,
       |       CAST(coalesce(n_moved, 0) AS BIGINT) AS n_moved
       |FROM c16 FULL JOIN c17 USING (shard)""".stripMargin) { (spark, dir) =>
    // the raw polynomial hash is AFFINE in its prefix: w(s1) - w(s2)
    // collapses to (h(s1#) - h(s2#))·31^len(doc) mod p, a constant per
    // doc-id length class, so the per-doc argmax degenerates (observed:
    // every doc on one shard). Squaring mod p adds the cross term
    // 2·h(s#)·31^k·doc — non-linear in the doc part, which is what a
    // rendezvous weight needs; x ≤ 1e9 so x² fits a long exactly in
    // both engines.
    val hs = (0 until 17).map { s =>
      val x = polyHash(concat(lit(s + "#"), col("doc_id").cast("string")))
      struct(pmod(x * x, lit(1000000007L)).as("w"), lit(s.toLong).as("s"))
    }
    // strict > keeps the earlier (lower-index) element on ties — the
    // same tie rule as the oracle's max-then-min-shard two-step
    val argmax = "aggregate(%s, named_struct('w', CAST(-1 AS BIGINT), " +
      "'s', CAST(-1 AS BIGINT)), (acc, x) -> IF(x.w > acc.w, x, acc)).s"
    val a = Tables(spark, dir, "documents")
      .select(col("doc_id"), array(hs: _*).as("arr"))
      .select(col("doc_id"),
        expr(argmax.format("slice(arr, 1, 16)")).as("a16"),
        expr(argmax.format("arr")).as("a17"))
    val c16 = a.groupBy(col("a16").as("shard")).agg(count(lit(1)).as("n16"))
    val c17 = a.groupBy(col("a17").as("shard")).agg(count(lit(1)).as("n17"),
      count(when(col("a16") =!= col("a17"), 1)).as("n_moved"))
    c16.join(c17, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n16"), lit(0L)).as("n16"),
        coalesce(col("n17"), lit(0L)).as("n17"),
        coalesce(col("n_moved"), lit(0L)).as("n_moved"))
  }

  /** Per-source unigram KL divergence against the corpus distribution —
    * the domain-drift score a mix controller reads before reweighting
    * sources (a source whose token distribution wanders from the
    * corpus mean gets flagged). Add-one smoothing over the corpus
    * vocabulary; each ln term floor-quantized on the 2^40 grid and
    * weighted by the source's token count, so the reported `kl_q40` is
    * an exact integer both engines reproduce (divide by n_tokens for
    * nats). Terms run over tokens PRESENT in the source (the standard
    * observed-support variant).
    *
    * SCALE: token counts are vocabulary×sources-bounded aggregates;
    * the join is token-keyed (vocabulary-sized, not corpus-sized);
    * scalar totals broadcast.
    */
  val sourceKl: QueryDef = QueryDef.sql(
    "q_source_kl",
    s"""WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
       |st AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
       |ct AS (SELECT tok, count(*) AS cc FROM tk GROUP BY 1),
       |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM st GROUP BY 1),
       |scal AS (SELECT count(*) AS nc, count(DISTINCT tok) AS v FROM tk)
       |SELECT st.source, CAST(max(ns.ns) AS BIGINT) AS n_tokens,
       |       CAST(sum(st.c * CAST(floor(ln(((st.c + 1) * 1.0 / (ns.ns + v))
       |                                    / ((ct.cc + 1) * 1.0 / (nc + v))) * $Q40)
       |                            AS BIGINT)) AS BIGINT) AS kl_q40
       |FROM st JOIN ct USING (tok) JOIN ns ON ns.source = st.source, scal
       |GROUP BY st.source""".stripMargin) { (spark, dir) =>
    val tk = Tables(spark, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val st = tk.groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val ct = tk.groupBy("tok").agg(count(lit(1)).as("cc"))
    val ns = st.groupBy("source").agg(sum("c").cast("long").as("ns"))
    val scal = tk.agg(count(lit(1)).as("nc"), countDistinct("tok").as("v"))
    st.join(ct, "tok").join(broadcast(ns), "source").crossJoin(broadcast(scal))
      .select(col("source"), col("ns"),
        (col("c") * floor(log(((col("c") + 1) * lit(1.0) / (col("ns") + col("v")))
          / ((col("cc") + 1) * lit(1.0) / (col("nc") + col("v")))) * expr(Q40))
          .cast("long")).as("t"))
      .groupBy("source")
      .agg(max("ns").as("n_tokens"), sum("t").cast("long").as("kl_q40"))
  }

  /** Distinct-n-gram diversity per source (the "distinct-n" metric):
    * unique/total ratios for 1/2/3-grams, scaled ×1000. A source full
    * of templated or looping text shows a collapsed distinct-2/3 ratio
    * long before exact dedup finds anything — the cheap first look at
    * generation-degeneracy or boilerplate in an incoming feed.
    *
    * SCALE: n-gram emission is map-side (`concat_ws` over a slice —
    * no intermediate array per position); the per-source
    * distinct+total aggregate is (source × distinct-n-gram)-bounded.
    */
  val distinctNgrams: QueryDef = {
    def duckGrams(n: Int): String =
      if (n == 1) "unnest(toks)"
      else s"unnest(list_transform(range(1, len(toks) - ${n - 2}), " +
        s"i -> array_to_string(toks[i:i + ${n - 1}], ' ')))"
    QueryDef.sql(
      "q_distinct_ngrams",
      s"""WITH tk AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
         |${(1 to 3).map(n =>
          s"""g$n AS (SELECT source, count(DISTINCT g) AS d$n, count(*) AS t$n
             |        FROM (SELECT source, ${duckGrams(n)} AS g FROM tk
             |              WHERE len(toks) >= $n) GROUP BY source)""".stripMargin)
          .mkString(",\n")}
         |SELECT g1.source,
         |${(1 to 3).map(n =>
          s"""       CAST(d$n AS BIGINT) AS d$n, CAST(t$n AS BIGINT) AS t$n,
             |       CAST((d$n * 1000) // t$n AS BIGINT) AS r${n}_x1000""".stripMargin)
          .mkString(",\n")}
         |FROM g1 JOIN g2 USING (source) JOIN g3 USING (source)""".stripMargin) {
      (spark, dir) =>
        // three gram sizes each replay the scan+tokenize otherwise —
        // one materialized token frame feeds all three aggregates
        // (round 16; durability: round-12 ledger class)
        val tk = Tables(spark, dir, "documents")
          .select(col("source"), tokens(col("text")).as("toks"))
          .localCheckpoint()
        def grams(n: Int) = {
          val g = if (n == 1) explode(col("toks"))
            else explode(expr(s"transform(sequence(1, size(toks) - ${n - 1}), " +
              s"i -> concat_ws(' ', slice(toks, i, $n)))"))
          tk.filter(size(col("toks")) >= n).select(col("source"), g.as("g"))
            .groupBy("source")
            .agg(countDistinct("g").as(s"d$n"), count(lit(1)).as(s"t$n"))
        }
        grams(1).join(grams(2), "source").join(grams(3), "source")
          .select(col("source") +: (1 to 3).flatMap(n => Seq(
            col(s"d$n"), col(s"t$n"),
            expr(s"d$n * 1000 DIV t$n").as(s"r${n}_x1000"))): _*)
    }
  }

  val all: Seq[QueryDef] =
    Seq(dsir, gopherRules, rendezvousShard, sourceKl, distinctNgrams)
}
