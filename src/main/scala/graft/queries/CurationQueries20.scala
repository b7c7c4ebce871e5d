package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Twentieth curation batch: diversity-aware selection. */
object CurationQueries20 {

  private val K = 5 // selections
  private val S = 16 // retrieved shortlist

  /** MMR SELECT — Maximal Marginal Relevance (Carbonell & Goldstein
    * 1998): greedily pick k items maximizing 2*rel(d) - max_{s∈S}
    * sim(d, s), the reranker that turns a similarity shortlist into a
    * DIVERSE exemplar set (few-shot pools, eval panels, dedup'd
    * retrieval). Architecture is the production split: the SHORTLIST
    * retrieval is the distributed part (integer-dot top-16 via
    * TakeOrderedAndProject — the zero-Exchange q_topk_cosine shape);
    * the greedy rerank is O(k*s) dot products on 16 rows and runs on
    * the driver (the `q_bpe_learn`/IVF-centroid bounded-collect
    * precedent — distributing 256 multiplications would be parody).
    * All scores are exact integer algebra on the Q20 grid (floor
    * against a DOUBLE literal, the silhouette discipline), so the
    * DuckDB twin — a recursive CTE carrying the selected-vector list,
    * argmax per step with id tie-break — reproduces every pick
    * bit-for-bit. The fixture-visible effect: MMR's picks genuinely
    * depart from the pure-relevance top-k (diversity displaces the
    * near-duplicate runner-up).
    */
  val mmrSelect: QueryDef = QueryDef.sql(
    "q_mmr_select",
    s"""WITH RECURSIVE
       |q AS (SELECT list_transform(embedding, x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qe
       |      FROM embeddings WHERE vec_id = 0),
       |iv AS (SELECT vec_id, list_transform(embedding, x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS e
       |       FROM embeddings WHERE vec_id <> 0),
       |rel AS (SELECT vec_id, e,
       |        list_reduce(list_transform(range(1, len(e) + 1), i -> e[i] * qe[i]), (a, b) -> a + b) AS r
       |        FROM iv, q),
       |cand AS (SELECT vec_id, e, r FROM rel ORDER BY r DESC, vec_id LIMIT $S),
       |sel AS (
       |  SELECT 0 AS step, CAST([] AS BIGINT[]) AS ids, CAST([] AS BIGINT[][]) AS vecs
       |  UNION ALL
       |  SELECT step + 1,
       |         list_append(ids, (SELECT c.vec_id FROM cand c WHERE NOT list_contains(ids, c.vec_id)
       |            ORDER BY 2 * c.r - coalesce(list_max(list_transform(vecs, v ->
       |              CAST(list_sum(list_transform(list_zip(c.e, v), p -> p[1] * p[2])) AS BIGINT))), 0) DESC,
       |              c.vec_id
       |            LIMIT 1)),
       |         list_append(vecs, (SELECT c.e FROM cand c WHERE NOT list_contains(ids, c.vec_id)
       |            ORDER BY 2 * c.r - coalesce(list_max(list_transform(vecs, v ->
       |              CAST(list_sum(list_transform(list_zip(c.e, v), p -> p[1] * p[2])) AS BIGINT))), 0) DESC,
       |              c.vec_id
       |            LIMIT 1))
       |  FROM sel WHERE step < $K)
       |SELECT CAST(step AS BIGINT) AS step, ids[len(ids)] AS picked
       |FROM sel WHERE step > 0""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val emb = Tables(spark, dir, "embeddings")
    val quant = transform(col("embedding"),
      x => floor(x.cast("double") * lit(1048576.0)).cast("long"))
    val qv = emb.filter(col("vec_id") === 0).select(quant.as("qe"))
    val cand = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), quant.as("e"))
      .crossJoin(broadcast(qv))
      .withColumn("r",
        expr("aggregate(zip_with(e, qe, (x, y) -> x * y), CAST(0 AS BIGINT), (a, b) -> a + b)"))
      .orderBy(col("r").desc, col("vec_id")).limit(S)
      .select("vec_id", "e", "r").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var sel = Vector.empty[(Long, Array[Long])]
    for (_ <- 1 to K) {
      val best = cand.filter(c => !sel.exists(_._1 == c._1)).map { c =>
        val maxSim = if (sel.isEmpty) 0L else sel.map(s => dot(c._2, s._2)).max
        (2 * c._3 - maxSim, c._1, c._2)
      }.minBy(t => (-t._1, t._2))
      sel = sel :+ ((best._2, best._3))
    }
    sel.zipWithIndex.map { case ((id, _), i) => ((i + 1).toLong, id) }
      .toDF("step", "picked")
  }

  val all: Seq[QueryDef] = Seq(mmrSelect)
}
