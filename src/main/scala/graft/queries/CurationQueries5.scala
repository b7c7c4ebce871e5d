package graft.queries

import org.apache.spark.sql.functions.{log => lnf, _}
import graft.{QueryDef, Tables}

/** Fifth curation batch: cohort retention (the event-side engagement
  * signal a data pipeline joins against document sources), a Zipf
  * rank-frequency fit (corpus-health scalar: a healthy natural-language
  * corpus fits slope ≈ −1; synthetic or templated text drifts off),
  * linear quality-classifier inference (the fastText-style scoring head
  * applied as a map-only expression), and temperature-flattened source
  * mixing weights (the n^(1/2) upsampling rule for low-resource
  * sources). All arithmetic is exact-integer or identically-ordered
  * IEEE: lns are quantized to the 2^20 grid before any sum, sums of
  * per-row products ride DECIMAL casts, and sqrt is correctly-rounded
  * in both engines.
  */
object CurationQueries5 {

  private val Q20 = 1048576L // 2^20 ln-quantization grid (products stay in BIGINT)

  /** D1/D7 cohort retention over `events`: users grouped by first-seen
    * day, retained = any activity exactly 1 / 7 days later. Two keyed
    * aggregations on user_id (co-partitioned: the distinct-day table and
    * the cohort table shuffle on the same key) and a date-sized final
    * rollup. At 100 TB of events the per-user state is the distinct
    * active-day set, which the first aggregation reduces map-side.
    */
  val retention: QueryDef = QueryDef.sql(
    "q_retention",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |c AS (SELECT user_id, min(d) AS d0 FROM ud GROUP BY user_id),
      |r AS (SELECT c.user_id, c.d0,
      |             max(CASE WHEN ud.d = c.d0 + 1 THEN 1 ELSE 0 END) AS r1,
      |             max(CASE WHEN ud.d = c.d0 + 7 THEN 1 ELSE 0 END) AS r7
      |      FROM c JOIN ud ON ud.user_id = c.user_id
      |      GROUP BY 1, 2)
      |SELECT d0 AS cohort_day, CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(sum(r1) AS BIGINT) AS d1_retained,
      |       CAST(sum(r7) AS BIGINT) AS d7_retained,
      |       CAST(floor(sum(r1) * 10000.0 / count(*)) AS BIGINT) AS d1_bp,
      |       CAST(floor(sum(r7) * 10000.0 / count(*)) AS BIGINT) AS d7_bp
      |FROM r GROUP BY d0""".stripMargin) { (spark, dir) =>
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    // ROUND-16 SHAPE (guide §2.4): ONE per-user aggregate carries the
    // cohort day and the active-day set (horizon-bounded, the
    // HourRollup class — it grows with wall-clock days, not bytes), so
    // the cohort-join replay of the distinct pass disappears.
    val r = ud.groupBy("user_id")
      .agg(min(col("d")).as("d0"), collect_set(col("d")).as("ds"))
      .select(col("user_id"), col("d0"),
        array_contains(col("ds"), date_add(col("d0"), 1)).cast("int").as("r1"),
        array_contains(col("ds"), date_add(col("d0"), 7)).cast("int").as("r7"))
    r.groupBy(col("d0").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("r1")).cast("long").as("d1_retained"),
        sum(col("r7")).cast("long").as("d7_retained"),
        floor(sum(col("r1")) * 10000.0 / count(lit(1))).cast("long").as("d1_bp"),
        floor(sum(col("r7")) * 10000.0 / count(lit(1))).cast("long").as("d7_bp"))
  }

  /** Zipf rank-frequency fit: OLS of ln(freq) on ln(rank) over the token
    * frequency table — slope ≈ −1 is the natural-language signature. The
    * lns are quantized to the 2^20 grid per row (the grid cancels in the
    * slope), per-row products stay inside BIGINT, and the five sums ride
    * DECIMAL casts, so both engines feed identical integers into an
    * identically-ordered double formula. The rank rides the repo's
    * global-dense-rank idiom — a distributed range-sort on the unique
    * total order (cnt DESC, tok) + `zipWithIndex` — NOT an
    * unpartitioned window: the vocabulary table grows with the corpus
    * (Heaps ~N^0.7, and the SNM postmortem measured a prefix-keyed
    * "vocab" table at Θ(docs) under the linear-vocab adversary), so a
    * single-task rank sort is the q_bpe_encode round-10 whale. The
    * exact ln(rank) floors still see the exact tie order — zipWithIndex
    * indexes the same total order the window would — so the fit is
    * bit-identical to the oracle's row_number form. The fit itself is
    * one scalar aggregation. (`q_zipf_topk` remains the serving-knob
    * variant: a fit on the top-K head only, constant-size by
    * construction.)
    */
  val zipfFit: QueryDef = QueryDef.sql(
    "q_zipf_fit",
    s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |f AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
       |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk FROM f),
       |q AS (SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * $Q20) AS BIGINT) AS x,
       |             CAST(floor(ln(CAST(cnt AS DOUBLE)) * $Q20) AS BIGINT) AS y
       |      FROM r),
       |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |             CAST(sum(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
       |             CAST(sum(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
       |             CAST(sum(CAST(x * y AS DECIMAL(18,0))) AS DOUBLE) AS sxy,
       |             CAST(sum(CAST(x * x AS DECIMAL(18,0))) AS DOUBLE) AS sxx
       |      FROM q)
       |SELECT CAST(n AS BIGINT) AS n_vocab,
       |       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       |       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n / $Q20.0
       |         AS intercept_ln
       |FROM s""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val f = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    // global dense rank over the unique total order (cnt DESC, tok):
    // range-sort + per-partition offsets (PrefixSum.globalRowNumber —
    // InternalRow end to end, no per-row Row encode/decode)
    val q = graft.operators.PrefixSum.globalRowNumber(
        f.select(col("cnt"), col("tok")),
        Seq(col("cnt").desc, col("tok").asc), "rnk")
      .select(floor(lnf(col("rnk").cast("double")) * Q20).cast("long").as("x"),
        floor(lnf(col("cnt").cast("double")) * Q20).cast("long").as("y"))
    val s = q.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x").cast("decimal(18,0)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(18,0)")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(18,0)")).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast("decimal(18,0)")).cast("double").as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    s.select(col("n").cast("long").as("n_vocab"),
      slope.as("slope"),
      ((col("sy") - slope * col("sx")) / col("n") / Q20.toDouble).as("intercept_ln"))
  }

  // q_quality_logreg moved to CurationQueries33 (round 10): inference
  // now consumes the weights LEARNED by q_quality_train's gradient
  // loop instead of a hand-fixed vector.

  /** Temperature-flattened source mixing: sampling weight ∝ n^(1/2)
    * instead of ∝ n — the standard low-resource upsampling rule. sqrt
    * is correctly-rounded IEEE in both engines and the normalization is
    * exact integer division over the quantized weights, so the emitted
    * shares match bit-for-bit. Source-count-sized data end to end.
    */
  val temperatureMix: QueryDef = QueryDef.sql(
    "q_temperature_mix",
    s"""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source),
       |w AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE)) * $Q20) AS BIGINT) AS wq
       |      FROM s),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot, CAST(sum(wq) AS BIGINT) AS wtot FROM w)
       |SELECT w.source, w.n,
       |       CAST(floor(w.n * 10000.0 / t.tot) AS BIGINT) AS share_bp,
       |       CAST(floor(w.wq * 10000.0 / t.wtot) AS BIGINT) AS temp_bp
       |FROM w, t""".stripMargin) { (spark, dir) =>
    val s = Tables(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
    val w = s.select(col("source"), col("n"),
      floor(sqrt(col("n").cast("double")) * Q20).cast("long").as("wq"))
    val t = w.agg(sum(col("n")).as("tot"), sum(col("wq")).as("wtot"))
    w.crossJoin(broadcast(t))
      .select(col("source"), col("n"),
        floor(col("n") * 10000.0 / col("tot")).cast("long").as("share_bp"),
        floor(col("wq") * 10000.0 / col("wtot")).cast("long").as("temp_bp"))
  }

  /** The CAPSTONE composite: the full curation pipeline as ONE checked
    * query, emitting the doc/token funnel a pipeline report shows —
    * raw → quality gate (`q_quality_filter` predicate) → exact dedup
    * (min-id keeper) → train split (content-hash bucket < 90, the
    * `q_sample_split` convention) → decontamination (drop train docs
    * sharing a non-hot 8-gram fingerprint with the held-out split, the
    * `q_decontam` machinery). Every stage reuses a fragment proven by
    * its standalone query; what this adds is the COMPOSITION — stages
    * chain as DataFrames with no materialization between them, and the
    * whole funnel is one job. Counts are exact integers.
    */
  val pipelineFunnel: QueryDef = QueryDef.sql(
    "q_pipeline_funnel",
    s"""WITH tok AS (SELECT doc_id, text,
       |                    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents),
       |f AS (SELECT doc_id, text, nt,
       |             CAST(floor(len(list_distinct(string_split(text, ' '))) * 10000.0 / nt) AS BIGINT) AS uniq_bp,
       |             CAST(floor(len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the'))) * 10000.0 / nt) AS BIGINT) AS stop_bp
       |      FROM tok),
       |s1 AS (SELECT doc_id, text, nt FROM f
       |       WHERE nt >= 20 AND uniq_bp >= 4000 AND stop_bp <= 1000),
       |ex AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY text),
       |s2 AS (SELECT s1.* FROM s1 JOIN ex USING (doc_id)),
       |sp AS (SELECT doc_id, ${graft.functions.TextFunctions.polyHashSql("text")} % 100 AS bucket
       |       FROM documents),
       |s3 AS (SELECT s2.* FROM s2 JOIN sp USING (doc_id) WHERE sp.bucket < 90),
       |held AS (SELECT s2.doc_id FROM s2 JOIN sp USING (doc_id) WHERE sp.bucket >= 90),
       |sh8 AS (SELECT doc_id, unnest(${graft.functions.TextFunctions.shinglesSql("string_split(text, ' ')", 8)}) AS s
       |        FROM s2),
       |hs8 AS (SELECT DISTINCT doc_id, ${graft.functions.TextFunctions.polyHashSql("s")} AS h FROM sh8),
       |hot AS (SELECT h FROM hs8 GROUP BY h HAVING count(*) > 64),
       |k AS (SELECT hs8.doc_id, hs8.h FROM hs8 ANTI JOIN hot USING (h)),
       |contam AS (SELECT DISTINCT a.doc_id
       |           FROM k a JOIN k b ON a.h = b.h
       |                    JOIN held ON held.doc_id = b.doc_id
       |           WHERE a.doc_id <> b.doc_id),
       |s4 AS (SELECT s3.* FROM s3 ANTI JOIN contam USING (doc_id))
       |SELECT * FROM (
       |  SELECT '00_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(nt) AS BIGINT) AS n_tokens FROM tok
       |  UNION ALL
       |  SELECT '10_quality', CAST(count(*) AS BIGINT), CAST(sum(nt) AS BIGINT) FROM s1
       |  UNION ALL
       |  SELECT '20_exact_dedup', CAST(count(*) AS BIGINT), CAST(sum(nt) AS BIGINT) FROM s2
       |  UNION ALL
       |  SELECT '30_train_split', CAST(count(*) AS BIGINT), CAST(sum(nt) AS BIGINT) FROM s3
       |  UNION ALL
       |  SELECT '40_decontam', CAST(count(*) AS BIGINT), CAST(sum(nt) AS BIGINT) FROM s4
       |)""".stripMargin) { (spark, dir) =>
    import graft.functions.TextFunctions.polyHash
    import graft.operators.Dedup
    val toks = split(col("text"), " ")
    val tok = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), size(toks).cast("long").as("nt"))
    val qpred = col("nt") >= 20 &&
      floor(size(array_distinct(toks)) * 10000.0 / col("nt")).cast("long") >= 4000 &&
      floor(size(filter(toks, t => t === "a" || t === "the")) * 10000.0 / col("nt"))
        .cast("long") <= 1000
    // ROUND-16 SHAPE (guide §2.4): the first cut union-ed five
    // per-stage aggregates, each replaying everything upstream — 34
    // parquet scans / 52 exchanges in the physical plan for a 5-row
    // funnel. Now: (a) stages 00+10 fold into ONE conditional aggregate
    // over one scan; (b) the exact-dedup keeper is a window min over
    // the content key — one exchange, no groupBy+self-join replay;
    // (c) the train/held bucket is a pure function of text (polyhash),
    // a COLUMN on the deduped frame, not a join back to a re-scan;
    // (d) the post-dedup frame is materialized ONCE (localCheckpoint —
    // single-JVM durability note as per the q_ivf_kmeans site) and the
    // last three stages fold into one conditional aggregate over it.
    // 2 corpus scans total; same 5 rows (oracle unchanged, still green).
    val early = tok.select(col("nt"), qpred.as("q"))
      .agg(count(lit(1)).as("n0"), sum(col("nt")).cast("long").as("t0"),
        count(when(col("q"), 1)).as("n1"),
        sum(when(col("q"), col("nt"))).cast("long").as("t1"))
    val s1 = tok.filter(qpred)
    // keeper via the narrow content key — never group by raw text
    // (the Dedup.contentKey shuffle discipline)
    val s2 = s1.withColumn("m", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(
          graft.operators.Dedup.contentKey(col("text")))))
      .filter(col("doc_id") === col("m"))
      .select(col("doc_id"), col("text"), col("nt"),
        (polyHash(col("text")) % 100 < 90).as("train"))
      .localCheckpoint()
    val held = s2.filter(!col("train")).select("doc_id")
    val hs8 = Dedup.shingleHashTable(s2, "doc_id", "text", 8)
    // df-cap via count-over-window on ONE h-keyed exchange (round-12
    // containment-family cut — was a groupBy + anti-join double shuffle)
    val k = hs8.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("df") <= 64).drop("df")
    val contam = k.select(col("doc_id").as("adoc"), col("h"))
      .join(k.select(col("doc_id").as("bdoc"), col("h")), "h")
      .join(held.select(col("doc_id").as("bdoc")), "bdoc")
      .filter(col("adoc") =!= col("bdoc"))
      .select(col("adoc").as("doc_id")).distinct()
    val late = s2.join(contam.withColumn("contam", lit(true)), Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n2"), sum(col("nt")).cast("long").as("t2"),
        count(when(col("train"), 1)).as("n3"),
        sum(when(col("train"), col("nt"))).cast("long").as("t3"),
        count(when(col("train") && col("contam").isNull, 1)).as("n4"),
        sum(when(col("train") && col("contam").isNull, col("nt"))).cast("long").as("t4"))
    def rows(df: org.apache.spark.sql.DataFrame,
             stages: Seq[(String, String, String)]) =
      df.select(explode(array(stages.map { case (s, n, t) =>
          struct(lit(s).as("stage"), col(n).as("n_docs"), col(t).as("n_tokens"))
        }: _*)).as("r"))
        .select(col("r.stage"), col("r.n_docs"), col("r.n_tokens"))
    rows(early, Seq(("00_raw", "n0", "t0"), ("10_quality", "n1", "t1")))
      .unionAll(rows(late, Seq(("20_exact_dedup", "n2", "t2"),
        ("30_train_split", "n3", "t3"), ("40_decontam", "n4", "t4"))))
  }

  /** The Zipf fit's head-only serving variant (round 13 — written as
    * the scale path while `q_zipf_fit` still ranked through a global
    * window; the full fit now ranks via range-sort + zipWithIndex, so
    * BOTH forms scale — this one stays because a top-K fit is the
    * practitioner's knob): the
    * fit runs on the TOP-K frequency table instead of the full
    * vocabulary. Top-K by (cnt desc, tok) is a distributed
    * TakeOrderedAndProject — no single-task vocabulary window — and
    * because those K rows hold exactly the global ranks 1..K, the rank
    * window that follows runs over a PROVABLY K-bounded input (the
    * registry window gate classifies it `limit`). The head of the
    * rank-frequency curve is where a Zipf slope is actually estimated
    * in practice (the tail's ties at cnt=1,2 carry no slope signal and
    * distort OLS); the oracle keeps the textbook global row_number with
    * `rnk <= K`, proving top-K-then-rank ≡ rank-then-filter.
    */
  val zipfTopk: QueryDef = {
    val K = 512
    QueryDef.sql(
      "q_zipf_topk",
      s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |f AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
         |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk FROM f),
         |q AS (SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * $Q20) AS BIGINT) AS x,
         |             CAST(floor(ln(CAST(cnt AS DOUBLE)) * $Q20) AS BIGINT) AS y
         |      FROM r WHERE rnk <= $K),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |             CAST(sum(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
         |             CAST(sum(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
         |             CAST(sum(CAST(x * y AS DECIMAL(18,0))) AS DOUBLE) AS sxy,
         |             CAST(sum(CAST(x * x AS DECIMAL(18,0))) AS DOUBLE) AS sxx
         |      FROM q)
         |SELECT CAST(n AS BIGINT) AS n_fit,
         |       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         |       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n / $Q20.0
         |         AS intercept_ln
         |FROM s""".stripMargin) { (spark, dir) =>
      val f = Tables(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc)
        .limit(K) // distributed top-K: TakeOrderedAndProject, no window
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("tok").asc)
      val q = f.withColumn("rnk", row_number().over(w)) // K-bounded input
        .select(floor(lnf(col("rnk").cast("double")) * Q20).cast("long").as("x"),
          floor(lnf(col("cnt").cast("double")) * Q20).cast("long").as("y"))
      val s = q.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x").cast("decimal(18,0)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(18,0)")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast("decimal(18,0)")).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast("decimal(18,0)")).cast("double").as("sxx"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      s.select(col("n").cast("long").as("n_fit"),
        slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n") / Q20.toDouble).as("intercept_ln"))
    }
  }

  val all: Seq[QueryDef] = Seq(retention, zipfFit, temperatureMix,
    pipelineFunnel, zipfTopk)
}
