package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.{polyHash, polyHashSql}

/** Twenty-second curation batch: suffix duplicates (the head-stripped
  * mirror of `q_prefix_dup`) and shard COMPOSITION balance (volume
  * balance is `q_shard_assign`; this checks that every shard also
  * carries the global source mix — the property epoch-local training
  * on one shard actually depends on).
  */
object CurationQueries22 {

  /** SUFFIX DUPLICATES — documents that are a strict token-boundary
    * SUFFIX of another: the head-stripped re-crawl (nav/boilerplate
    * header removed, body identical), the mirror artifact of the
    * truncated tail. Blocking on the LAST-8-token hash (stripping the
    * head preserves the tail), df-capped 64, exact ends_with verify
    * inside the join (the `q_prefix_dup` decade probe showed in-join
    * verify beats candidate-fetch whenever block size beats the match
    * rate — same trade here). Derived fixtures: every 8th document
    * contributes its second half under a shifted id. SCALE: identical
    * to q_prefix_dup — one df-capped head... tail-hash equi-join,
    * linear in corpus text mass.
    */
  val suffixDup: QueryDef = QueryDef.sql(
    "q_suffix_dup",
    s"""WITH tr AS (SELECT doc_id + 20000000 AS doc_id,
       |                  array_to_string(list_slice(string_split(text, ' '),
       |                    len(string_split(text, ' ')) - (len(string_split(text, ' ')) + 1) // 2 + 1,
       |                    len(string_split(text, ' '))), ' ') AS text
       |           FROM documents WHERE doc_id % 8 = 0),
       |u AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM tr),
       |t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM u),
       |h AS (SELECT doc_id, text,
       |             ${polyHashSql("array_to_string(list_slice(toks, len(toks) - 7, len(toks)), ' ')")} AS h8
       |      FROM t WHERE len(toks) >= 8),
       |kept AS (SELECT h8 FROM h GROUP BY h8 HAVING count(*) <= 64),
       |hk AS (SELECT h.* FROM h JOIN kept ON kept.h8 = h.h8),
       |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
       |             CAST(length(a.text) AS BIGINT) AS la,
       |             CAST(length(b.text) AS BIGINT) AS lb
       |      FROM hk a JOIN hk b ON a.h8 = b.h8 AND a.doc_id <> b.doc_id
       |      WHERE length(a.text) < length(b.text)
       |        AND ends_with(b.text, ' ' || a.text))
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(count(DISTINCT ida) AS BIGINT) AS n_suffix_docs,
       |       CAST(count(DISTINCT idb) AS BIGINT) AS n_full_docs,
       |       CAST(CASE WHEN count(*) = 0 THEN 0
       |                 ELSE sum((la * 10000) // lb) // count(*) END AS BIGINT) AS avg_suffix_bp
       |FROM p""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val trunc = docs.filter(pmod(col("doc_id"), lit(8L)) === 0)
      .select((col("doc_id") + 20000000L).as("doc_id"),
        expr("array_join(slice(split(text, ' '), " +
          "size(split(text, ' ')) - (size(split(text, ' ')) + 1) DIV 2 + 1, " +
          "(size(split(text, ' ')) + 1) DIV 2), ' ')").as("text"))
    val t = docs.unionByName(trunc)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 8)
    val h = t.select(col("doc_id"), col("text"),
      polyHash(array_join(expr("slice(toks, size(toks) - 7, 8)"), " ")).as("h8"))
    // ROUND-16 SHAPE: df-cap via count-over-window on ONE h8-keyed
    // exchange + ONE materialization feeding both self-join ends (the
    // q_prefix_dup cut applied to the suffix mirror; was 4 chain
    // replays; durability: round-12 ledger class).
    val hk = h.withColumn("dfh", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h8"))))
      .filter(col("dfh") <= 64).drop("dfh")
      .localCheckpoint()
    hk.as("a").join(hk.as("b"),
        col("a.h8") === col("b.h8") && col("a.doc_id") =!= col("b.doc_id") &&
          length(col("a.text")) < length(col("b.text")) &&
          col("b.text").endsWith(concat(lit(" "), col("a.text"))))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        length(col("a.text")).cast("long").as("la"),
        length(col("b.text")).cast("long").as("lb"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("ida").as("n_suffix_docs"),
        countDistinct("idb").as("n_full_docs"),
        expr("CASE WHEN count(*) = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE sum((la * 10000) DIV lb) DIV count(*) END").as("avg_suffix_bp"))
  }

  /** SHARD COMPOSITION MIX — per shard (the `q_shard_assign` salted
    * id-hash, 32 shards): how far the shard's SOURCE composition
    * deviates from the corpus-global mix, in basis points (max and
    * total absolute deviation). Volume balance says shards are equal
    * SIZED; composition balance says each shard is a faithful SAMPLE —
    * the property that lets one shard stand in for the corpus in
    * epoch-local training, eval sharding, or progressive loading. A
    * content-correlated sharder (e.g. sorted-by-source files) passes
    * volume balance and fails this. SCALE: map-side shard assignment,
    * (32 x sources) agg, then source-sized broadcast algebra.
    */
  val shardMix: QueryDef = QueryDef.sql(
    "q_shard_mix",
    s"""WITH m AS (SELECT ${polyHashSql("'shard|' || CAST(doc_id AS VARCHAR)")} % 32 AS shard,
       |                 source FROM documents),
       |ss AS (SELECT shard, source, count(*) AS n FROM m GROUP BY 1, 2),
       |sh AS (SELECT shard, sum(n) AS n_s FROM ss GROUP BY 1),
       |src AS (SELECT source, sum(n) AS n_src FROM ss GROUP BY 1),
       |tot AS (SELECT sum(n) AS td FROM ss),
       |dev AS (SELECT ss.shard,
       |               abs(ss.n * 10000 // sh.n_s - src.n_src * 10000 // tot.td) AS d
       |        FROM ss JOIN sh ON sh.shard = ss.shard
       |                JOIN src ON src.source = ss.source, tot)
       |SELECT CAST(dev.shard AS BIGINT) AS shard,
       |       CAST(sh.n_s AS BIGINT) AS n_docs,
       |       CAST(max(d) AS BIGINT) AS max_dev_bp,
       |       CAST(sum(d) AS BIGINT) AS sum_dev_bp
       |FROM dev JOIN sh ON sh.shard = dev.shard
       |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val m = Tables(spark, dir, "documents")
      .select((polyHash(concat(lit("shard|"), col("doc_id").cast("string"))) % 32).as("shard"),
        col("source"))
    val ss = m.groupBy("shard", "source").agg(count(lit(1)).as("n"))
    val sh = ss.groupBy("shard").agg(sum("n").as("n_s"))
    val src = ss.groupBy("source").agg(sum("n").as("n_src"))
    val tot = ss.agg(sum("n").as("td"))
    ss.join(sh, "shard").join(broadcast(src), "source").crossJoin(broadcast(tot))
      .select(col("shard"), col("n_s"),
        abs(expr("n * 10000 DIV n_s") - expr("n_src * 10000 DIV td")).as("d"))
      .groupBy(col("shard"), col("n_s").as("n_docs"))
      .agg(max("d").as("max_dev_bp"), sum("d").as("sum_dev_bp"))
  }

  val all: Seq[QueryDef] = Seq(suffixDup, shardMix)
}
