package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.HashExpressions.{shingleHashesFast, winnowFast}
import graft.functions.TextFunctions.tokens

/** Thirty-first batch: the sketch storage ledger. */
object CurationQueries31 {

  /** SKETCH STORAGE — measured unit counts and byte budgets for every
    * derived index tier this engine maintains: MinHash signatures
    * (8 perms x 8 B/doc), SimHash (8 B/doc), the winnowed fingerprint
    * index (8 B per selected fingerprint), the exact shingle postings
    * (16 B per (doc, shingle) entry), int8 vectors (dim + 8 B scale)
    * and PQ codes (4 B/vec). The ratios are the load-bearing numbers:
    * postings vs winnow is the exact-vs-sampled dedup storage trade
    * this round measured end to end, and raw-float vs int8 vs PQ is
    * the serving-layout ladder. All counts come from one documents
    * pass (codegen kernels) and one embeddings count — the byte
    * algebra is exact integers on both engines. SCALE: two scans, two
    * 1-row aggregates, a 6-row output at any corpus size.
    */
  val sketchStorage: QueryDef = QueryDef.sql(
    "q_sketch_storage",
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh AS (SELECT doc_id, unnest(range(1, greatest(len(toks) - 1, 1))) AS pos, toks FROM tk),
       |hrow AS (SELECT doc_id, pos,
       |                ${graft.functions.TextFunctions.polyHashSql(
                          "array_to_string(list_slice(toks, pos, pos + 2), ' ')")} AS h
       |         FROM sh),
       |hs AS (SELECT doc_id, list(h ORDER BY pos) AS h FROM hrow GROUP BY doc_id),
       |wins AS (SELECT doc_id,
       |                CASE WHEN len(h) >= 4
       |                     THEN list_transform(range(1, len(h) - 2),
       |                                         j -> list_min(list_slice(h, j, j + 3)))
       |                     ELSE [list_min(h)] END AS w
       |         FROM hs),
       |d AS (SELECT count(*) AS n_docs FROM documents),
       |p AS (SELECT count(*) AS n_postings FROM (SELECT DISTINCT doc_id, h FROM hrow) x),
       |wf AS (SELECT sum(len(list_distinct(w))) AS n_fp FROM wins),
       |v AS (SELECT count(*) AS n_vecs, max(len(embedding)) AS dim FROM embeddings)
       |SELECT tier, CAST(n_units AS BIGINT) AS n_units, CAST(bytes AS BIGINT) AS bytes
       |FROM (
       |  SELECT 'minhash_sigs' AS tier, d.n_docs AS n_units, d.n_docs * 64 AS bytes FROM d
       |  UNION ALL SELECT 'simhash', d.n_docs, d.n_docs * 8 FROM d
       |  UNION ALL SELECT 'winnow_index', wf.n_fp, wf.n_fp * 8 FROM wf
       |  UNION ALL SELECT 'shingle_postings', p.n_postings, p.n_postings * 16 FROM p
       |  UNION ALL SELECT 'int8_vectors', v.n_vecs, v.n_vecs * (v.dim + 8) FROM v
       |  UNION ALL SELECT 'pq_codes', v.n_vecs, v.n_vecs * 4 FROM v) u""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val toks = tokens(col("text"))
    val per = Tables(spark, dir, "documents")
      .select(size(shingleHashesFast(toks, 3)).cast("long").as("np"),
        size(winnowFast(toks, 3, 4)).cast("long").as("nf"))
      .agg(count(lit(1)).as("n_docs"), sum("np").as("n_postings"), sum("nf").as("n_fp"))
    val v = Tables.embeddings(spark, dir)
      .agg(count(lit(1)).as("n_vecs"), max(size(col("embedding"))).cast("long").as("dim"))
    val counts = per.crossJoin(broadcast(v)).head()
    val (nd, np, nf, nv, dim) = (counts.getLong(0), counts.getLong(1),
      counts.getLong(2), counts.getLong(3), counts.getLong(4))
    Seq(
      ("minhash_sigs", nd, nd * 64),
      ("simhash", nd, nd * 8),
      ("winnow_index", nf, nf * 8),
      ("shingle_postings", np, np * 16),
      ("int8_vectors", nv, nv * (dim + 8)),
      ("pq_codes", nv, nv * 4)
    ).toDF("tier", "n_units", "bytes")
  }

  val all: Seq[QueryDef] = Seq(sketchStorage)
}
