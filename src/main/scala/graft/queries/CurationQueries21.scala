package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.HashExpressions.{orderedPairsFast, shingleHashesFast, winnowFast}

/** Twenty-first curation batch: the accuracy-eval member for the
  * winnowing family — every sketch tier here carries one (MinHash:
  * `q_minhash_est`, int8: `q_int8_recall`, HLL/CM: error columns, PQ:
  * `q_pq_recall`); this closes the gap for fingerprint sampling.
  */
object CurationQueries21 {

  /** WINNOW CONTAINMENT EVAL — for every winnow-candidate pair
    * (>= 3 shared fingerprints, df-capped index): the SAMPLED overlap
    * estimate shared/min(|fp_a|,|fp_b|) against the EXACT distinct-
    * shingle overlap coefficient, reported as a signed error histogram
    * (500-bp buckets) with per-bucket means. This is the number that
    * justifies replacing the exact-postings tier with the ~40%-sampled (~2.5x sparser)
    * winnowed index at 100 TB: the winnowing guarantee bounds which
    * runs can be MISSED, and this query measures how much the sampled
    * estimate wobbles on the pairs it does catch. SCALE: candidates
    * ride the capped fingerprint join; the exact verify joins shingle
    * sets only for candidate rows (never all pairs) — the
    * `q_minhash_est` verify shape on the winnow axis.
    */
  val winnowContainment: QueryDef = QueryDef.sql(
    "q_winnow_containment",
    s"""${CurationQueries16.winnowCte},
       |fps AS (SELECT doc_id, list_distinct(w) AS fp FROM wins),
       |shs AS (SELECT doc_id, list(DISTINCT h) AS sh FROM hrow GROUP BY doc_id),
       |fpx AS (SELECT doc_id, unnest(fp) AS f FROM fps),
       |kept AS (SELECT f FROM fpx GROUP BY f HAVING count(*) BETWEEN 2 AND 64),
       |fpk AS (SELECT fpx.doc_id, fpx.f FROM fpx JOIN kept ON kept.f = fpx.f),
       |pr AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS shared
       |       FROM fpk a JOIN fpk b ON a.f = b.f AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2 HAVING count(*) >= 3),
       |ev AS (SELECT pr.shared * 10000 // least(len(fa.fp), len(fb.fp)) AS est_bp,
       |              len(list_intersect(sa.sh, sb.sh)) * 10000
       |                // least(len(sa.sh), len(sb.sh)) AS exact_bp
       |       FROM pr JOIN fps fa ON fa.doc_id = pr.ida
       |               JOIN fps fb ON fb.doc_id = pr.idb
       |               JOIN shs sa ON sa.doc_id = pr.ida
       |               JOIN shs sb ON sb.doc_id = pr.idb)
       |SELECT CAST((est_bp - exact_bp) // 500 AS BIGINT) AS err_bucket,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(sum(est_bp) // count(*) AS BIGINT) AS avg_est_bp,
       |       CAST(sum(exact_bp) // count(*) AS BIGINT) AS avg_exact_bp
       |FROM ev GROUP BY 1""".stripMargin) { (spark, dir) =>
    val toks = split(col("text"), " ")
    // consumed THREE times (candidate chain + both verify ends) — one
    // winnow+shingle kernel pass, not three (round 16; durability:
    // round-12 ledger class)
    val sides = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        winnowFast(toks, 3, 4).as("fp"),
        shingleHashesFast(toks, 3).as("sh"))
      .localCheckpoint()
    // capped collect (round-13 aggkeys sweep, same fix as
    // q_winnow_overlap): exact count n + at most 65 buffered ids, so
    // the 2..64 df filter sees identical groups while a boilerplate
    // fingerprint can no longer put Θ(corpus) ids in one reducer buffer
    val cappedCollect = udaf(
      new graft.operators.TypedOps.CappedCollectAggregator(64),
      org.apache.spark.sql.Encoders.scalaLong)
    val pairs = sides
      .select(col("doc_id"), explode(col("fp")).as("f"))
      .groupBy("f").agg(cappedCollect(col("doc_id")).as("c"))
      .filter(col("c.n").between(2, 64))
      .select(explode(orderedPairsFast(col("c.ids"))).as("p"))
      .groupBy(col("p.ida").as("ida"), col("p.idb").as("idb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
    val a = sides.select(col("doc_id").as("ida"), col("fp").as("fpa"), col("sh").as("sha"))
    val b = sides.select(col("doc_id").as("idb"), col("fp").as("fpb"), col("sh").as("shb"))
    pairs.join(a, "ida").join(b, "idb")
      .select(
        expr("shared * 10000 DIV least(size(fpa), size(fpb))").as("est_bp"),
        expr("size(array_intersect(sha, shb)) * 10000 DIV least(size(sha), size(shb))")
          .as("exact_bp"))
      .groupBy(expr("(est_bp - exact_bp) DIV 500").as("err_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(est_bp) DIV count(*)").as("avg_est_bp"),
        expr("sum(exact_bp) DIV count(*)").as("avg_exact_bp"))
  }

  val all: Seq[QueryDef] = Seq(winnowContainment)
}
