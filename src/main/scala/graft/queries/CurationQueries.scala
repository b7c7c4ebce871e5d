package graft.queries

import org.apache.spark.sql.functions.{log => lnf, _}
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHashSql, shinglesSql}
import graft.operators.Dedup

/** Training-data curation queries over `documents` / `events`: rule-based
  * quality filtering, entropy scoring, corpus-derived stopwords, n-gram
  * statistics, co-occurrence/PMI, recency weighting, and containment
  * dedup. Determinism discipline matches the rest of the ledger: ratios
  * are integer basis points, every `ln` is quantized to an integer grid
  * BEFORE any aggregation (the q_bm25/q_bigram_lm idiom), and decimal
  * sums ride the per-row DECIMAL cast.
  */
object CurationQueries {

  private val Q40 = 1099511627776L // 2^40 — the shared ln-quantization grid

  /** Rule-based quality filter — the composite keep/drop gate a pretraining
    * pipeline runs first (C4/Gopher-style): length bounds, lexical
    * diversity, stopword density. One map-side pass per document (no
    * shuffle at all — every measure is computed inside the scan), with
    * integer basis-point ratios so both engines agree exactly.
    */
  val qualityFilter: QueryDef = QueryDef.sql(
    "q_quality_filter",
    """WITH m AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
      |         CAST(len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the'))) AS BIGINT) AS n_stop
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(floor(n_uniq * 10000.0 / n_tokens) AS BIGINT) AS uniq_bp,
      |         CAST(floor(n_stop * 10000.0 / n_tokens) AS BIGINT) AS stop_bp
      |  FROM m)
      |SELECT doc_id, n_tokens, uniq_bp, stop_bp,
      |       CASE WHEN n_tokens < 20 THEN 'short'
      |            WHEN uniq_bp < 4000 THEN 'low_diversity'
      |            WHEN stop_bp > 1000 THEN 'stopword_heavy'
      |            ELSE 'ok' END AS reason,
      |       (n_tokens >= 20 AND uniq_bp >= 4000 AND stop_bp <= 1000) AS keep
      |FROM r""".stripMargin) { (spark, dir) =>
    val toks = split(col("text"), " ")
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        size(filter(toks, t => t === "a" || t === "the")).cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("n_uniq") * 10000.0 / col("n_tokens")).cast("long").as("uniq_bp"),
        floor(col("n_stop") * 10000.0 / col("n_tokens")).cast("long").as("stop_bp"))
      .withColumn("reason",
        when(col("n_tokens") < 20, "short")
          .when(col("uniq_bp") < 4000, "low_diversity")
          .when(col("stop_bp") > 1000, "stopword_heavy")
          .otherwise("ok"))
      .withColumn("keep",
        col("n_tokens") >= 20 && col("uniq_bp") >= 4000 && col("stop_bp") <= 1000)
  }

  /** Character-distribution Shannon entropy per document — the classic
    * gibberish/boilerplate detector (uniform noise scores high, repeated
    * filler low). Each `k·ln(k/n)` term is quantized to the 2^40 grid
    * before the per-document sum, so the aggregation is exact integer
    * arithmetic — order-independent across engines and partitionings.
    * Two keyed aggregations over the exploded chars; at corpus scale the
    * char alphabet bounds the group count per doc (~100), so state is
    * tiny and the shuffle carries (doc_id, char) partial counts only.
    */
  val charEntropy: QueryDef = QueryDef.sql(
    "q_char_entropy",
    s"""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
       |ck AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
       |cn AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n FROM ck GROUP BY 1)
       |SELECT ck.doc_id, CAST(max(cn.n) AS BIGINT) AS n_chars,
       |       CAST(-sum(ck.k * CAST(floor(ln(CAST(ck.k AS DOUBLE) / CAST(cn.n AS DOUBLE))
       |                                   * $Q40) AS BIGINT)) AS BIGINT) AS ent_q40
       |FROM ck JOIN cn USING (doc_id)
       |GROUP BY ck.doc_id""".stripMargin) { (spark, dir) =>
    val ck = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("k"))
    val cn = ck.groupBy("doc_id").agg(sum(col("k")).as("n"))
    ck.join(cn, "doc_id")
      .groupBy("doc_id")
      .agg(max(col("n")).cast("long").as("n_chars"),
        (-sum(col("k") * floor(lnf(col("k").cast("double") / col("n").cast("double"))
          * lit(Q40.toDouble)).cast("long"))).cast("long").as("ent_q40"))
  }

  /** Corpus-derived stopword list: tokens whose document frequency
    * exceeds 30% of the corpus. Two aggregations and a broadcast of the
    * single-row count — the df table is vocabulary-sized, so this is the
    * cheapest query in the curation family at any corpus size.
    */
  val stopwordDerive: QueryDef = QueryDef.sql(
    "q_stopword_derive",
    """WITH tk AS (SELECT DISTINCT doc_id, tok FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |d AS (SELECT tok, count(*) AS df FROM tk GROUP BY tok),
      |n AS (SELECT count(*) AS nd FROM documents)
      |SELECT tok, CAST(df AS BIGINT) AS df,
      |       CAST(floor(df * 10000.0 / nd) AS BIGINT) AS df_bp
      |FROM d, n WHERE df * 10 >= nd * 3""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    val tk = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok")).distinct()
    val d = tk.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("nd"))
    d.crossJoin(broadcast(n))
      .filter(col("df") * 10 >= col("nd") * 3)
      .select(col("tok"), col("df"),
        floor(col("df") * 10000.0 / col("nd")).cast("long").as("df_bp"))
  }

  /** Corpus-wide top-20 trigrams by count — exact integer counts, global
    * top-k planned as `TakeOrderedAndProject` (per-partition heap +
    * merge, never a global sort; same plan family as `q_topk_cosine`).
    */
  val trigramTop: QueryDef = QueryDef.sql(
    "q_trigram_top",
    """WITH tk AS (SELECT string_split(text, ' ') AS toks FROM documents),
      |tg AS (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tri
      |       FROM tk, unnest(range(1, len(toks) - 1)) t(i))
      |SELECT tri, CAST(count(*) AS BIGINT) AS cnt
      |FROM tg GROUP BY tri
      |ORDER BY cnt DESC, tri LIMIT 20""".stripMargin) { (spark, dir) =>
    // materialize the split ONCE per row: element_at over the raw
    // split(...) expression re-evaluates the split per lambda call
    // (subexpression elimination does not cross lambda boundaries),
    // turning trigram emission O(L^2) in document length
    val toks = col("toks")
    Tables(spark, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .filter(size(toks) >= 3)
      .select(explode(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tri").asc)
      .limit(20)
  }

  /** Token co-occurrence with pointwise mutual information — the word-
    * association signal (collocation mining, topic coherence), in the
    * standard DISTANCE-WINDOWED form: a co-occurrence event is a pair of
    * kept-token positions within ±5 of each other in the same document.
    * Scale shape (the round-6 `weak` fix): the old per-document pair
    * self-join was O(m²) in per-doc kept-token count m — a hot-key
    * quadratic on one 50k-token document. Windowed pairs are emitted
    * MAP-SIDE from the per-doc sorted position array (≤ 5·L pairs per
    * doc — corpus-LINEAR, no join at all before the final count), which
    * is also the textbook collocation definition; round 9 moved the
    * emission into a codegen kernel (`WindowedPairsExpr`) and
    * materialized the kept-position array once so the corpus is scanned
    * twice (df pass + array build), not four times. Kept tokens are those
    * with df in [5, 0.9·N] (content words, same df-window blocking as
    * the n-gram dedup family); pairs below support 5 are dropped before
    * PMI. PMI = ln(c(x,y)·T / (c(x)·c(y))) over windowed occurrence
    * counts, quantized on the 2^40 grid; its argument is a ratio of
    * exact integer products, so both engines divide the same doubles.
    */
  val cooccurPmi: QueryDef = QueryDef.sql(
    "q_cooccur_pmi",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |tp AS (SELECT doc_id, i AS pos, toks[i] AS tok
       |       FROM tk, unnest(range(1, len(toks) + 1)) t(i)),
       |d AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tp GROUP BY tok),
       |n AS (SELECT count(*) AS nd FROM documents),
       |kept AS (SELECT d.tok FROM d, n WHERE d.df >= 5 AND d.df * 10 <= n.nd * 9),
       |kp AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tp JOIN kept USING (tok)),
       |occ AS (SELECT tok, count(*) AS c FROM kp GROUP BY tok),
       |tot AS (SELECT count(*) AS nt FROM kp),
       |p AS (SELECT least(a.tok, b.tok) AS t1, greatest(a.tok, b.tok) AS t2,
       |             count(*) AS cxy
       |      FROM kp a JOIN kp b
       |        ON a.doc_id = b.doc_id AND b.pos > a.pos
       |       AND b.pos <= a.pos + 5 AND a.tok <> b.tok
       |      GROUP BY 1, 2)
       |SELECT p.t1, p.t2, CAST(p.cxy AS BIGINT) AS cxy,
       |       CAST(floor(ln(CAST(p.cxy AS DOUBLE) * tot.nt / (oa.c * ob.c))
       |                  * $Q40) AS BIGINT) AS pmi_q40
       |FROM p JOIN occ oa ON oa.tok = p.t1
       |       JOIN occ ob ON ob.tok = p.t2, tot
       |WHERE p.cxy >= 5""".stripMargin) { (spark, dir) =>
    val W = 5
    val docs = Tables(spark, dir, "documents")
    val tp = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val d = tp.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("nd"))
    val kept = d.crossJoin(broadcast(n))
      .filter(col("df") >= 5 && col("df") * 10 <= col("nd") * 9)
      .select(col("tok"))
    // ONE corpus pass builds the per-doc sorted kept-position array and
    // materializes it (tokens only — a fraction of the text bytes);
    // occ, tot, and the pair stream all read the materialized frame
    // instead of each re-scanning and re-exploding the corpus (the old
    // shape ran the posexplode FOUR times: df, occ, tot, pairs)
    val adf = tp.join(kept, "tok")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("tok")))).as("a"))
      .localCheckpoint()
    val a = col("a")
    val occ = adf.select(explode(col("a")).as("x"))
      .groupBy(col("x.tok").as("tok")).agg(count(lit(1)).as("c"))
    val tot = adf.agg(sum(size(a)).as("nt"))
    // pairs within ±W emitted map-side by a codegen kernel (positions
    // are distinct, so partners live in the next ≤W slots; the kernel
    // breaks early on the sorted positions — the old nested HOF copied
    // a W-slice and built lambda frames per position, interpreted)
    val pairs = adf
      .select(explode(graft.functions.HashExpressions.windowedPairsFast(a, W)).as("pr"))
      .select(col("pr.t1").as("t1"), col("pr.t2").as("t2"))
    val p = pairs.groupBy("t1", "t2").agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 5)
    p.join(occ.select(col("tok").as("t1"), col("c").as("ca")), "t1")
      .join(occ.select(col("tok").as("t2"), col("c").as("cb")), "t2")
      .crossJoin(broadcast(tot))
      .select(col("t1"), col("t2"), col("cxy"),
        floor(lnf(col("cxy").cast("double") * col("nt") / (col("ca") * col("cb")))
          * lit(Q40.toDouble)).cast("long").as("pmi_q40"))
  }

  /** Recency-weighted event aggregate — the freshness weighting a
    * curation run applies before mixing sources: weight = max(0, 45 −
    * age_days) against a fixed anchor, value summed through the per-row
    * DECIMAL cast (exact, order-independent) and emitted as DOUBLE. One
    * keyed aggregation; the weights are integers so both engines do the
    * identical exact arithmetic.
    */
  val recencyWeight: QueryDef = QueryDef.sql(
    "q_recency_weight",
    """WITH w AS (
      |  SELECT event_type, value,
      |         greatest(0, 45 - CAST(floor((epoch_us(TIMESTAMP '2024-02-01 00:00:00')
      |                                      - epoch_us(ts)) / 86400000000.0) AS BIGINT)) AS wt
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(wt) AS BIGINT) AS w_sum,
      |       CAST(sum(CAST(value AS DECIMAL(18,4)) * wt) AS DOUBLE) AS weighted_value
      |FROM w GROUP BY event_type""".stripMargin) { (spark, dir) =>
    val anchorUs = java.time.LocalDateTime.of(2024, 2, 1, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        greatest(lit(0L),
          lit(45L) - floor((lit(anchorUs) - unix_micros(col("ts"))) / 86400000000.0)
            .cast("long")).as("wt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("wt")).as("w_sum"),
        sum(col("value").cast("decimal(18,4)") * col("wt")).cast("double")
          .as("weighted_value"))
  }

  /** Containment-based near-dup detection — the asymmetric complement of
    * Jaccard: |A∩B| / min(|A|,|B|) catches a document EMBEDDED in a
    * larger one (quotes, concatenated crawls) that symmetric Jaccard
    * dilutes below threshold. Same df-capped shingle-hash backbone as
    * `q_ngram_jaccard` (hot-shingle anti-join, banded never all-pairs),
    * different final score.
    */
  val containment: QueryDef = QueryDef.sql(
    "q_containment",
    s"""WITH sh AS (SELECT doc_id, unnest(${shinglesSql("string_split(text, ' ')", 3)}) AS s
       |            FROM documents),
       |hs AS (SELECT DISTINCT doc_id, ${polyHashSql("s")} AS h FROM sh),
       |kept AS (SELECT h FROM hs GROUP BY h HAVING count(*) <= 64),
       |hsk AS (SELECT hs.doc_id, hs.h FROM hs JOIN kept ON kept.h = hs.h),
       |cardk AS (SELECT doc_id, count(*) AS c FROM hsk GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
       |          FROM hsk a JOIN hsk b ON a.h = b.h AND a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id)
       |SELECT i.ida, i.idb,
       |       CAST(i.i AS DOUBLE) / least(ca.c, cb.c) AS containment
       |FROM inter i JOIN cardk ca ON ca.doc_id = i.ida
       |             JOIN cardk cb ON cb.doc_id = i.idb
       |WHERE CAST(i.i AS DOUBLE) / least(ca.c, cb.c) >= 0.8""".stripMargin) { (spark, dir) =>
    val hs = Dedup.shingleHashTable(Tables(spark, dir, "documents"), "doc_id", "text", 3)
    Dedup.ngramJaccardPairs(hs, "doc_id", 0.0)
      .withColumn("containment", col("i").cast("double") / least(col("ca"), col("cb")))
      .filter(col("containment") >= 0.8)
      .select(col("ida"), col("idb"), col("containment"))
  }

  val all: Seq[QueryDef] = Seq(qualityFilter, charEntropy, stopwordDerive,
    trigramTop, cooccurPmi, recencyWeight, containment)
}
