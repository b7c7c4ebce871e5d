package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql}

/** Fifteenth curation batch: corpus OPERABILITY — the shard integrity
  * manifest (the checksum table that makes a training-data release
  * reproducible and diffable) and the corpus version diff (what changed
  * between two snapshots, computed by content hash without shipping
  * text through the join).
  */
object CurationQueries15 {

  /** SHARD INTEGRITY MANIFEST — per shard (doc_id mod 16): document
    * count, token mass, XOR of every document's content hash, and the
    * id range. Two manifests agree iff the shards carry identical
    * content (w.h.p.), so a re-run of the pipeline, a storage
    * migration, or a replica can be certified byte-equivalent by
    * comparing 16 rows instead of re-reading terabytes — the data
    * release's analog of a checksum file. XOR is the right integrity
    * fold at scale: associative + commutative ⇒ map-side combinable,
    * order-independent across partitionings, and mergeable across
    * manifest shards (the HLL-register idiom on the integrity axis).
    * SCALE: one map pass (hash per doc) into a 16-row aggregate; no
    * joins, no second scan.
    */
  val shardManifest: QueryDef = QueryDef.sql(
    "q_shard_manifest",
    s"""WITH h AS (SELECT doc_id, doc_id % 16 AS shard,
       |                 ${polyHashSql("text")} AS h,
       |                 len(string_split(text, ' ')) AS nt
       |          FROM documents)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(nt) AS BIGINT) AS n_tokens,
       |       CAST(bit_xor(h) AS BIGINT) AS xor_hash,
       |       CAST(min(doc_id) AS BIGINT) AS min_id,
       |       CAST(max(doc_id) AS BIGINT) AS max_id
       |FROM h GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(pmod(col("doc_id"), lit(16L)).as("shard"), col("doc_id"),
        polyHash(col("text")).as("h"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("nt").cast("long").as("n_tokens"),
        expr("bit_xor(h)").as("xor_hash"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
  }

  /** CORPUS VERSION DIFF — the snapshot-to-snapshot change report:
    * added / deleted / changed / unchanged document counts and token
    * mass, computed by a full outer join on doc identity with CONTENT
    * HASHES compared instead of text (at scale the diff never ships
    * document bodies through the shuffle — each side carries 16 bytes
    * of hash, the `q_shard_manifest` integrity fold applied row-wise).
    * The two versions are derived deterministically from the fixture
    * (old = ids ∤ 7; new = ids ∤ 11, with every 5th document edited) so
    * all four statuses are exercised; the MECHANISM — outer join on
    * id, hash inequality ⇒ changed, null sides ⇒ added/deleted — is
    * exactly the production shape. SCALE: one hash-only shuffle on
    * doc_id, then a 4-row aggregate; token mass rides the same rows.
    */
  val corpusDiff: QueryDef = QueryDef.sql(
    "q_corpus_diff",
    s"""WITH vold AS (SELECT doc_id, ${polyHashSql("text")} AS h,
       |                    len(string_split(text, ' ')) AS nt
       |             FROM documents WHERE doc_id % 7 <> 0),
       |vnew AS (SELECT doc_id,
       |                ${polyHashSql("CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END")} AS h,
       |                len(string_split(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END, ' ')) AS nt
       |         FROM documents WHERE doc_id % 11 <> 0),
       |j AS (SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
       |                  WHEN n.doc_id IS NULL THEN 'deleted'
       |                  WHEN o.h <> n.h THEN 'changed'
       |                  ELSE 'unchanged' END AS status,
       |             coalesce(n.nt, o.nt) AS nt
       |      FROM vold o FULL JOIN vnew n ON n.doc_id = o.doc_id)
       |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(nt) AS BIGINT) AS n_tokens
       |FROM j GROUP BY 1""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    val vold = docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0)
      .select(col("doc_id").as("oid"), polyHash(col("text")).as("oh"),
        size(split(col("text"), " ")).cast("long").as("ont"))
    val newText = when(pmod(col("doc_id"), lit(5L)) === 0,
      concat(col("text"), lit(" v2"))).otherwise(col("text"))
    val vnew = docs.filter(pmod(col("doc_id"), lit(11L)) =!= 0)
      .select(col("doc_id").as("nid"), polyHash(newText).as("nh"),
        size(split(newText, " ")).cast("long").as("nnt"))
    vold.join(vnew, col("nid") === col("oid"), "full_outer")
      .select(
        when(col("oid").isNull, "added")
          .when(col("nid").isNull, "deleted")
          .when(col("oh") =!= col("nh"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("nnt"), col("ont")).as("nt"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"), sum("nt").cast("long").as("n_tokens"))
  }

  val all: Seq[QueryDef] = Seq(shardManifest, corpusDiff)
}
