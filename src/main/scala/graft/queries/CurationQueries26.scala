package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashMul, polyHashMulSql, polyHashSql, shingles, shinglesSql, tokens}

/** Twenty-sixth batch: the HASH-WIDTH audit — the scale-correctness
  * check behind every hash-keyed tier in this engine.
  */
object CurationQueries26 {

  /** HASH COLLISION AUDIT — the engine's content hash is a polynomial
    * fold mod 1e9+7 (~30 bits). Exact DOC dedup keys on full text and
    * is immune; but the hash-keyed tiers (chunk dedup, shingle
    * postings, manifests) would birthday-collide at corpus scale:
    * expected collisions ≈ n²/2p, which is ~500 at 1M distinct items
    * and catastrophic at 10^12. This query MEASURES it on the corpus's
    * distinct shingle strings — observed single-hash collisions vs the
    * n²/2p projection — and validates the mitigation: a second hash
    * with a DIFFERENT MULTIPLIER (37; a salted 31-hash stays affinely
    * correlated per length class, the rendezvous-shard trap), giving a
    * ~60-bit pair whose collision count on the same items is the third
    * column (expected ~n²/2p² ≈ 0). The production rule this query
    * enforces with numbers: any tier that MERGES by hash must either
    * key on content (doc dedup), tolerate w.h.p. equality (manifests),
    * or carry the 60-bit pair (chunk stores beyond ~10^8 items).
    * SCALE: one distinct-shingle shuffle + a 1-row aggregate; the
    * audit costs one pass over the vocabulary it protects.
    */
  val hashCollisions: QueryDef = QueryDef.sql(
    "q_hash_collisions",
    s"""WITH sh AS (SELECT DISTINCT unnest(${shinglesSql("string_split(text, ' ')", 3)}) AS s
       |           FROM documents),
       |h AS (SELECT s, ${polyHashSql("s")} AS h1, ${polyHashMulSql("s", 37)} AS h2 FROM sh),
       |a AS (SELECT count(*) AS n, count(DISTINCT h1) AS d1,
       |             count(DISTINCT (h1, h2)) AS d2 FROM h)
       |SELECT CAST(n AS BIGINT) AS n_items,
       |       CAST(n - d1 AS BIGINT) AS h1_collisions,
       |       CAST(n * n // 2000000014 AS BIGINT) AS expected_h1,
       |       CAST(n - d2 AS BIGINT) AS pair_collisions
       |FROM a""".stripMargin) { (spark, dir) =>
    // ROUND-16 SHAPE: the former single aggregate mixed one plain count
    // with TWO distinct groups, which Spark plans as an Expand — every
    // distinct-shingle row tripled into the aggregate exchange. Grouping
    // by the hash PAIR first partial-aggregates map-side (16 B keys),
    // and all three statistics fold out of the pair-group table:
    // n = Σ cnt, d2 = |groups|, d1 = |distinct h1 among groups| — one
    // narrow exchange instead of a 3x-expanded one, same values.
    val sh = Tables(spark, dir, "documents")
      .select(explode(shingles(tokens(col("text")), 3)).as("s")).distinct()
    sh.select(polyHash(col("s")).as("h1"), polyHashMul(col("s"), 37).as("h2"))
      .groupBy("h1", "h2").agg(count(lit(1)).as("cnt"))
      // coalesce: sum over an empty pair-group table is NULL where the
      // oracle's count(*) is 0 (round-16 ADVICE — empty-corpus contract)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n"), countDistinct("h1").as("d1"),
        count(lit(1)).as("d2"))
      .select(col("n").as("n_items"),
        (col("n") - col("d1")).as("h1_collisions"),
        expr("n * n DIV 2000000014").as("expected_h1"),
        (col("n") - col("d2")).as("pair_collisions"))
  }

  val all: Seq[QueryDef] = Seq(hashCollisions)
}
