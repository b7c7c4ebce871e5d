package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` fixture.
  *
  * - `q_ann_topk`: brute-force exact top-k for a *batch* of query vectors
  *   — the tiny query side is broadcast against the (at scale,
  *   partitioned) vector table; per-query ranking via window row_number.
  * - `q_centroids` / `q_centroid_spread`: per-label centroids and mean
  *   squared distance — k-means-style building blocks. Order-independence
  *   across engines: each float-origin value is scaled by a power of two
  *   (exact) and floored to BIGINT, so sums are exact integer arithmetic
  *   (DECIMAL casts of full-precision doubles are NOT cross-engine safe:
  *   DuckDB's cast rounds through double multiplication).
  * - `q_ivf_topk`: IVF-style probe — assign the query to its nearest
  *   centroid, then search only that partition. At 100 TB this is the
  *   scale path: the vector table is bucketed by centroid id, a probe
  *   touches 1/nlist of the data, and the centroid table is broadcast.
  */
object AnnQueries {

  private val Dim = 64

  /** 2^52: exact power-of-two scale for float-origin values (any |x| >=
    * 2^-29 scales to an exact integer; fixture min |x| ~ 8e-6). */
  private val S52 = "4503599627370496.0"
  private val S52d = 4503599627370496.0
  /** 2^45: scale for squared-term quantization (terms < 4, 32k-row sums
    * stay far inside BIGINT). */
  private val S45 = "35184372088832.0"
  private val S45d = 35184372088832.0

  val annTopk: QueryDef = QueryDef.sql(
    "q_ann_topk",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
       |d AS (SELECT qid, vec_id AS nid, ${cosDistSql("v", "qv")} AS dist
       |      FROM e, q WHERE vec_id <> qid),
       |r AS (SELECT qid, nid, dist,
       |             row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rank
       |      FROM d)
       |SELECT qid, rank, nid, dist FROM r WHERE rank <= 3""".stripMargin) { (spark, dir) =>
    // rank emitted as BIGINT like DuckDB's row_number (Spark's is INT)
    val emb = Tables.embeddings(spark, dir)
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id").asc)
    emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dist", cosineDistance(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id").as("nid"), col("dist"))
  }

  /** (label, dim 1-based, centroid) — exact decimal mean per dimension. */
  val centroids: QueryDef = QueryDef.sql(
    "q_centroids",
    s"""WITH ed AS (SELECT label, vec_id, i,
       |                   CAST(floor(embedding[i] * $S52) AS BIGINT) AS ix
       |            FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i))
       |SELECT label, i,
       |       CAST(sum(ix) AS DOUBLE) / $S52 / count(*) AS centroid
       |FROM ed GROUP BY label, i""".stripMargin) { (spark, dir) =>
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("label"), (col("i0") + 1).cast("long").as("i"),
        floor(col("x") * S52d).cast("long").as("ix"))
      .groupBy("label", "i")
      .agg((sum(col("ix").cast("decimal(38,0)")).cast("double") / S52d / count(lit(1))).as("centroid"))
  }

  private val CentCte =
    s"""ed AS (SELECT label, vec_id, i, embedding[i] AS x,
       |              CAST(floor(embedding[i] * $S52) AS BIGINT) AS ix
       |       FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |cent AS (SELECT label, i,
       |                CAST(sum(ix) AS DOUBLE) / $S52 / count(*) AS c
       |         FROM ed GROUP BY label, i)""".stripMargin

  /** Mean squared L2 distance of each label's members to their centroid. */
  val centroidSpread: QueryDef = QueryDef.sql(
    "q_centroid_spread",
    s"""WITH $CentCte,
       |terms AS (SELECT ed.label, ed.vec_id,
       |                 CAST(floor((ed.x - cent.c) * (ed.x - cent.c) * $S45) AS BIGINT) AS t
       |          FROM ed JOIN cent ON cent.label = ed.label AND cent.i = ed.i)
       |SELECT label,
       |       count(DISTINCT vec_id) AS n_vecs,
       |       CAST(sum(t) AS DOUBLE) / $S45 / count(DISTINCT vec_id) AS avg_dist2
       |FROM terms GROUP BY label""".stripMargin) { (spark, dir) =>
    val ed = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("label"), col("vec_id"), (col("i0") + 1).cast("long").as("i"), col("x"),
        floor(col("x") * S52d).cast("long").as("ix"))
    // centroid side renames BOTH key columns: the join below then needs no
    // dataset-id disambiguation (cent derives from ed, so `cent("i") ===
    // ed("i")` is one refactor away from a trivially-true predicate)
    val cent = ed.groupBy("label", "i")
      .agg((sum(col("ix").cast("decimal(38,0)")).cast("double") / S52d / count(lit(1))).as("c"))
      .withColumnRenamed("label", "clabel")
      .withColumnRenamed("i", "ci")
    ed.join(cent, col("clabel") === col("label") && col("ci") === col("i"))
      .select(col("label"), col("vec_id"),
        floor((col("x") - col("c")) * (col("x") - col("c")) * S45d).cast("long").as("t"))
      .groupBy("label")
      .agg(countDistinct(col("vec_id")).as("n_vecs"),
        (sum(col("t")).cast("double") / S45d / countDistinct(col("vec_id"))).as("avg_dist2"))
  }

  /** IVF probe: nearest centroid to the query vector, exact top-5 within
    * that one partition.
    */
  val ivfTopk: QueryDef = QueryDef.sql(
    "q_ivf_topk",
    s"""WITH $CentCte,
       |qd AS (SELECT i, embedding[i] AS qx
       |       FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i) WHERE vec_id = 0),
       |cdist AS (SELECT cent.label,
       |                 sum(CAST(floor((qd.qx - cent.c) * (qd.qx - cent.c) * $S45) AS BIGINT)) AS d2
       |          FROM cent JOIN qd ON qd.i = cent.i GROUP BY cent.label),
       |best AS (SELECT label FROM cdist ORDER BY d2, label LIMIT 1),
       |e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       |SELECT e.label AS probe_label, e.vec_id AS nid,
       |       ${cosDistSql("e.v", "q.qv")} AS dist
       |FROM e JOIN best ON e.label = best.label, q
       |WHERE e.vec_id <> 0
       |ORDER BY dist, e.vec_id
       |LIMIT 5""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val qlit = array(q.map(lit): _*)
    val ed = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("label"), (col("i0") + 1).cast("long").as("i"),
        floor(col("x") * S52d).cast("long").as("ix"))
    val cent = ed.groupBy("label", "i")
      .agg((sum(col("ix").cast("decimal(38,0)")).cast("double") / S52d / count(lit(1))).as("c"))
    // query dims as a literal-joined frame: reuse the collected vector
    val qd = cent.select(col("label"), col("i"), col("c"),
      element_at(qlit, col("i").cast("int")).as("qx"))
    val best = qd
      .select(col("label"), floor((col("qx") - col("c")) * (col("qx") - col("c")) * S45d).cast("long").as("t"))
      .groupBy("label").agg(sum(col("t")).as("d2"))
      .orderBy(col("d2").asc, col("label").asc).limit(1)
      .select(col("label").as("probe_label"))
    emb.join(broadcast(best), emb("label") === col("probe_label"))
      .filter(col("vec_id") =!= 0)
      .withColumn("dist", cosineDistance(col("embedding"), qlit))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(5)
      .select(col("probe_label"), col("vec_id").as("nid"), col("dist"))
  }

  /** IVF with PHYSICAL partition pruning ([[graft.operators.IvfIndex]]):
    * build = assign every vector to its nearest seed centroid (vec_id
    * 0..7, broadcast k×dim, exact quantized-L2 argmin) and write the
    * table `PARTITIONED BY (cluster)`; probe = nearest cluster to the
    * query vector, then top-5 cosine over ONLY that cluster's files —
    * `PartitionFilters` in the scan, not a post-scan filter (PLANS.md
    * carries the plan). The reference scans the entire table per query
    * (`vector-db.c:165-168`); this is the claimed headroom, now
    * demonstrated end-to-end and oracle-checked.
    */
  val ivfPruned: QueryDef = QueryDef.sql(
    "q_ivf_pruned",
    s"""WITH ed AS (SELECT vec_id, i, embedding[i] AS x
       |           FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |c0 AS (SELECT vec_id AS cluster, i, x AS c FROM ed WHERE vec_id < 8),
       |a1 AS (SELECT ed.vec_id, c0.cluster,
       |              CAST(sum(CAST(floor((ed.x - c0.c) * (ed.x - c0.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN c0 ON c0.i = ed.i GROUP BY 1, 2),
       |s1 AS (SELECT vec_id, cluster FROM (
       |         SELECT vec_id, cluster,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |         FROM a1) WHERE rn = 1),
       |qd AS (SELECT i, embedding[i] AS qx
       |       FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i) WHERE vec_id = 0),
       |cd AS (SELECT c0.cluster,
       |              CAST(sum(CAST(floor((qd.qx - c0.c) * (qd.qx - c0.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM c0 JOIN qd ON qd.i = c0.i GROUP BY 1),
       |best AS (SELECT cluster FROM cd ORDER BY d2, cluster LIMIT 1),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       |SELECT CAST(s1.cluster AS BIGINT) AS probe_cluster, e.vec_id AS nid,
       |       ${cosDistSql("e.v", "q.qv")} AS dist
       |FROM e JOIN s1 ON s1.vec_id = e.vec_id
       |       JOIN best ON s1.cluster = best.cluster, q
       |WHERE e.vec_id <> 0
       |ORDER BY dist, e.vec_id
       |LIMIT 5""".stripMargin) { (spark, dir) =>
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    // physical index: one assignment pass + partitioned write; the dir is
    // keyed by applicationId + sf dir so concurrent harness processes
    // never race on the same build/overwrite
    val indexDir = s"/tmp/graft_ivf/${spark.sparkContext.applicationId}/${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    IvfIndex.build(emb, seeds, indexDir)
    val qvec = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val best = IvfIndex.nearestCluster(seeds, qvec)
    val qlit = array(qvec.map(lit): _*)
    // pruned probe: only cluster=<best> files are scanned
    IvfIndex.probe(spark, indexDir, Seq(best))
      .filter(col("vec_id") =!= 0)
      .withColumn("dist", cosineDistance(col("embedding"), qlit))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(5)
      .select(col("cluster").cast("long").as("probe_cluster"),
        col("vec_id").as("nid"), col("dist"))
  }

  /** nprobe=2 variant of [[ivfPruned]]: the probe widens to the two
    * nearest clusters and the partition filter becomes a literal `IN` —
    * still file-pruned (recall/latency knob with the same plan shape).
    */
  val ivfNprobe: QueryDef = QueryDef.sql(
    "q_ivf_nprobe",
    s"""WITH ed AS (SELECT vec_id, i, embedding[i] AS x
       |           FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |c0 AS (SELECT vec_id AS cluster, i, x AS c FROM ed WHERE vec_id < 8),
       |a1 AS (SELECT ed.vec_id, c0.cluster,
       |              CAST(sum(CAST(floor((ed.x - c0.c) * (ed.x - c0.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN c0 ON c0.i = ed.i GROUP BY 1, 2),
       |s1 AS (SELECT vec_id, cluster FROM (
       |         SELECT vec_id, cluster,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |         FROM a1) WHERE rn = 1),
       |qd AS (SELECT i, embedding[i] AS qx
       |       FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i) WHERE vec_id = 0),
       |cd AS (SELECT c0.cluster,
       |              CAST(sum(CAST(floor((qd.qx - c0.c) * (qd.qx - c0.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM c0 JOIN qd ON qd.i = c0.i GROUP BY 1),
       |best AS (SELECT cluster FROM cd ORDER BY d2, cluster LIMIT 2),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       |SELECT CAST(s1.cluster AS BIGINT) AS probe_cluster, e.vec_id AS nid,
       |       ${cosDistSql("e.v", "q.qv")} AS dist
       |FROM e JOIN s1 ON s1.vec_id = e.vec_id
       |       JOIN best ON s1.cluster = best.cluster, q
       |WHERE e.vec_id <> 0
       |ORDER BY dist, e.vec_id
       |LIMIT 5""".stripMargin) { (spark, dir) =>
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    // own index dir: gate queries run concurrently, never share a sink
    val indexDir = s"/tmp/graft_ivf_np/${spark.sparkContext.applicationId}/${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    IvfIndex.build(emb, seeds, indexDir)
    val qvec = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val probed = IvfIndex.nearestClusters(seeds, qvec, 2)
    val qlit = array(qvec.map(lit): _*)
    IvfIndex.probe(spark, indexDir, probed)
      .filter(col("vec_id") =!= 0)
      .withColumn("dist", cosineDistance(col("embedding"), qlit))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(5)
      .select(col("cluster").cast("long").as("probe_cluster"),
        col("vec_id").as("nid"), col("dist"))
  }

  /** k-means (Lloyd), 2 iterations, k=8, deterministic seeds (vec_id
    * 0..7) — the clustering step of corpus curation (topic balancing,
    * IVF codebook training). Exact cross-engine by construction:
    * distances are Σ floor((x−c)²·2^45) BIGINTs ([[graft.functions.QuantizedL2Expr]],
    * order-independent integer sums), centroid means use the 2^52
    * quantization of [[centroids]], and argmin ties break on cluster id.
    *
    * Scale shape: assignment is a BROADCAST of the k×dim centroid matrix
    * against the vector table (no explode of the data side, distance in
    * one codegen loop per row×cluster); only the centroid UPDATE explodes
    * to (cluster, dim) — the same shuffle as [[centroids]]. Clusters that
    * lose all members drop out (standard Lloyd; deterministic here).
    */
  val kmeans: QueryDef = QueryDef.sql(
    "q_kmeans",
    s"""WITH ed AS (SELECT vec_id, i, embedding[i] AS x,
       |                  CAST(floor(embedding[i] * $S52) AS BIGINT) AS ix
       |           FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |c0 AS (SELECT vec_id AS cluster, i, x AS c FROM ed WHERE vec_id < 8),
       |a1 AS (SELECT ed.vec_id, c0.cluster,
       |              CAST(sum(CAST(floor((ed.x - c0.c) * (ed.x - c0.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN c0 ON c0.i = ed.i GROUP BY 1, 2),
       |s1 AS (SELECT vec_id, cluster FROM (
       |         SELECT vec_id, cluster,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |         FROM a1) WHERE rn = 1),
       |c1 AS (SELECT s1.cluster, ed.i, CAST(sum(ed.ix) AS DOUBLE) / $S52 / count(*) AS c
       |       FROM ed JOIN s1 ON s1.vec_id = ed.vec_id GROUP BY 1, 2),
       |a2 AS (SELECT ed.vec_id, c1.cluster,
       |              CAST(sum(CAST(floor((ed.x - c1.c) * (ed.x - c1.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN c1 ON c1.i = ed.i GROUP BY 1, 2)
       |SELECT vec_id, cluster, d2 FROM (
       |  SELECT vec_id, cluster, d2,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |  FROM a2) WHERE rn = 1""".stripMargin) { (spark, dir) =>
    import graft.functions.QuantizedL2Expr
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    def assign(cents: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cluster").asc)
      emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cluster"),
          QuantizedL2Expr.column(col("embedding"), col("cv"), 45).as("d2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cluster"), col("d2"))
    }
    val cent0 = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    val asg1 = assign(cent0).drop("d2")
    assign(lloydUpdate(emb, asg1))
  }

  /** One Lloyd centroid UPDATE: exact per-dim means of each cluster's
    * members (2^52 quantization), re-assembled into dim-ordered centroid
    * arrays `(cluster, cv)`. Shared by [[kmeans]] and [[ivfKmeans]].
    */
  private[graft] def lloydUpdate(emb: org.apache.spark.sql.DataFrame,
                                 asg: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    asg.join(emb, "vec_id")
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("cluster"), col("i0"), floor(col("x") * S52d).cast("long").as("ix"))
      .groupBy("cluster", "i0")
      .agg((sum(col("ix").cast("decimal(38,0)")).cast("double") / S52d / count(lit(1))).as("c"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("i0"), col("c")))),
        e => e.getField("c")).as("cv"))

  /** The `q_ivf_kmeans` trained codebook as a standalone frame — the
    * artifact a training session hands to [[graft.pipelines.ModelArtifacts
    * .saveCentroids]] so probe sessions never re-run the Lloyd chain
    * (ModelArtifactsSpec pins save → load → probe bit-for-bit against
    * the in-session path).
    */
  private[graft] def ivfCodebook(spark: org.apache.spark.sql.SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val seeds0 = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    lloydUpdate(emb, graft.operators.IvfIndex.assign(emb, seeds0))
  }

  /** The full production ANN path in one query: TRAIN a codebook (one
    * Lloyd update from the seeds — the `q_kmeans` math), BUILD the
    * physical index partitioned by the trained assignment, PROBE the
    * query's nearest trained centroid with file-level pruning, re-rank
    * by exact cosine. `q_kmeans`, `q_ivf_pruned` and this query chain
    * the same verified pieces; here they compose end-to-end, the way a
    * real corpus index is actually operated (train → layout → serve).
    */
  val ivfKmeans: QueryDef = QueryDef.sql(
    "q_ivf_kmeans",
    s"""WITH ed AS (SELECT vec_id, i, embedding[i] AS x,
       |                  CAST(floor(embedding[i] * $S52) AS BIGINT) AS ix
       |           FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |c0 AS (SELECT vec_id AS cluster, i, x AS c FROM ed WHERE vec_id < 8),
       |a1 AS (SELECT ed.vec_id, c0.cluster,
       |              CAST(sum(CAST(floor((ed.x - c0.c) * (ed.x - c0.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN c0 ON c0.i = ed.i GROUP BY 1, 2),
       |s1 AS (SELECT vec_id, cluster FROM (
       |         SELECT vec_id, cluster,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |         FROM a1) WHERE rn = 1),
       |c1 AS (SELECT s1.cluster, ed.i, CAST(sum(ed.ix) AS DOUBLE) / $S52 / count(*) AS c
       |       FROM ed JOIN s1 ON s1.vec_id = ed.vec_id GROUP BY 1, 2),
       |a2 AS (SELECT ed.vec_id, c1.cluster,
       |              CAST(sum(CAST(floor((ed.x - c1.c) * (ed.x - c1.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN c1 ON c1.i = ed.i GROUP BY 1, 2),
       |s2 AS (SELECT vec_id, cluster FROM (
       |         SELECT vec_id, cluster,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |         FROM a2) WHERE rn = 1),
       |qd AS (SELECT i, embedding[i] AS qx
       |       FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i) WHERE vec_id = 0),
       |cd AS (SELECT c1.cluster,
       |              CAST(sum(CAST(floor((qd.qx - c1.c) * (qd.qx - c1.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM c1 JOIN qd ON qd.i = c1.i GROUP BY 1),
       |best AS (SELECT cluster FROM cd ORDER BY d2, cluster LIMIT 1),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
       |SELECT CAST(s2.cluster AS BIGINT) AS probe_cluster, e.vec_id AS nid,
       |       ${cosDistSql("e.v", "q.qv")} AS dist
       |FROM e JOIN s2 ON s2.vec_id = e.vec_id
       |       JOIN best ON s2.cluster = best.cluster, q
       |WHERE e.vec_id <> 0
       |ORDER BY dist, e.vec_id
       |LIMIT 5""".stripMargin) { (spark, dir) =>
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val seeds0 = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    // the trained codebook is k×dim (KB-sized at any corpus size) but its
    // LINEAGE is the whole Lloyd chain; localCheckpoint materializes the
    // training once so the index build and the probe-side collect don't
    // each re-run it (was ~2 extra train executions per query).
    // Trade-off: localCheckpoint stores to executor-local blocks — lost
    // executors mean a failed query, not a recompute. Right for a
    // single-JVM bench; a 1000-executor deployment would swap this one
    // call for a reliable checkpoint (or cache + count) and keep the
    // same plan shape.
    val cent1 = lloydUpdate(emb, IvfIndex.assign(emb, seeds0)).localCheckpoint()
    val indexDir = s"/tmp/graft_ivf_km/${spark.sparkContext.applicationId}/${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
    IvfIndex.build(emb, cent1, indexDir)
    val qvec = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val best = IvfIndex.nearestClusters(cent1, qvec, 1)
    val qlit = array(qvec.map(lit): _*)
    IvfIndex.probe(spark, indexDir, best)
      .filter(col("vec_id") =!= 0)
      .withColumn("dist", cosineDistance(col("embedding"), qlit))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(5)
      .select(col("cluster").cast("long").as("probe_cluster"),
        col("vec_id").as("nid"), col("dist"))
  }

  /** Nearest-centroid classifier eval over the fixture's `label`
    * column: per-label centroids (exact 2^52 means — the
    * [[lloydUpdate]] math, seeded by the TRUE labels), every vector
    * assigned to its nearest centroid by exact integer-quantized L2,
    * output = the confusion matrix. This is the embedding-space
    * cluster-quality measurement a curation run uses to decide whether
    * labels (domains, topics, sources) are separable before stratifying
    * on them — and, like every eval here, it is oracle-checked rather
    * than asserted. Assignment = broadcast k×dim against the scan; the
    * data side never shuffles to be classified.
    */
  val centroidClassify: QueryDef = QueryDef.sql(
    "q_centroid_classify",
    s"""WITH ed AS (SELECT label, vec_id, i, embedding[i] AS x,
       |                  CAST(floor(embedding[i] * $S52) AS BIGINT) AS ix
       |           FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |cent AS (SELECT label AS clabel, i, CAST(sum(ix) AS DOUBLE) / $S52 / count(*) AS c
       |         FROM ed GROUP BY 1, 2),
       |a AS (SELECT ed.vec_id, ed.label, cent.clabel,
       |             CAST(sum(CAST(floor((ed.x - cent.c) * (ed.x - cent.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |      FROM ed JOIN cent ON cent.i = ed.i GROUP BY 1, 2, 3),
       |pred AS (SELECT vec_id, label, clabel AS pred FROM (
       |           SELECT vec_id, label, clabel,
       |                  row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
       |           FROM a) WHERE rn = 1)
       |SELECT CAST(label AS BIGINT) AS label, CAST(pred AS BIGINT) AS pred, count(*) AS n
       |FROM pred GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    import graft.functions.QuantizedL2Expr
    val emb = Tables.embeddings(spark, dir)
    // label centroids = one Lloyd update seeded by the true labels
    val cents = lloydUpdate(emb.select(col("vec_id"), col("embedding")),
      emb.select(col("vec_id"), col("label").as("cluster")))
      .select(col("cluster").as("clabel"), col("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("clabel").asc)
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("clabel"),
        QuantizedL2Expr.column(col("embedding"), col("cv"), 45).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("label").cast("long").as("label"),
        col("clabel").cast("long").as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** Embedding-space outlier detection — the OOD gate a curation run
    * applies before trusting embeddings downstream: assign every vector
    * to its nearest seed centroid (quantized-L2 argmin, d2 KEPT), fence
    * each cluster at its exact nearest-rank p95 distance (the
    * `q_median` order-statistic discipline — integer d2, ties to lower
    * vec_id), and count members beyond the fence. Everything is
    * integer-exact: no variance, no sqrt, no tolerance. Assignment is
    * the broadcast k×dim pattern; the fence is one window per cluster
    * over (d2, vec_id).
    */
  val embedOutliers: QueryDef = QueryDef.sql(
    "q_embed_outliers",
    s"""WITH ed AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       |            FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |c0 AS (SELECT vec_id AS cluster, i, x AS c FROM ed WHERE vec_id < 8),
       |a1 AS (SELECT ed.vec_id, c0.cluster,
       |              CAST(sum(CAST(floor((ed.x - c0.c) * (ed.x - c0.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |       FROM ed JOIN c0 ON c0.i = ed.i GROUP BY 1, 2),
       |s1 AS (SELECT vec_id, cluster, d2 FROM (
       |         SELECT vec_id, cluster, d2,
       |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
       |         FROM a1) WHERE rn = 1),
       |r AS (SELECT cluster, vec_id, d2,
       |             row_number() OVER (PARTITION BY cluster ORDER BY d2, vec_id) AS rn,
       |             count(*) OVER (PARTITION BY cluster) AS n
       |      FROM s1),
       |f AS (SELECT cluster, CAST(max(n) AS BIGINT) AS n_vecs,
       |             max(CASE WHEN rn = (n * 95 + 99) // 100 THEN d2 END) AS fence_d2
       |      FROM r GROUP BY cluster)
       |SELECT f.cluster, f.n_vecs, f.fence_d2,
       |       CAST(sum(CASE WHEN s1.d2 > f.fence_d2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       |FROM s1 JOIN f ON f.cluster = s1.cluster
       |GROUP BY f.cluster, f.n_vecs, f.fence_d2""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.QuantizedL2Expr
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cluster"), col("embedding").as("cv"))
    val wv = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cluster").asc)
    val s1 = emb.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cluster"),
        QuantizedL2Expr.column(col("embedding"), col("cv"), 45).as("d2"))
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cluster"), col("d2"))
    val wc = Window.partitionBy(col("cluster")).orderBy(col("d2").asc, col("vec_id").asc)
    val wn = Window.partitionBy(col("cluster"))
    val f = s1
      .withColumn("crn", row_number().over(wc))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col("cluster").as("fcluster"))
      .agg(max(col("n")).as("n_vecs"),
        // integral DIV, not a truncated double quotient: exact at any
        // per-group cardinality (double loses the low bits past ~2^46)
        max(when(col("crn") === expr("(n * 95 + 99) DIV 100"), col("d2")))
          .as("fence_d2"))
    s1.join(broadcast(f), col("fcluster") === col("cluster"))
      .groupBy(col("cluster"), col("n_vecs"), col("fence_d2"))
      .agg(sum(when(col("d2") > col("fence_d2"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Cluster SEPARATION, the complement of [[centroidSpread]]'s
    * cohesion: for every label cluster, the squared L2 distance to its
    * nearest OTHER centroid and the Davies-Bouldin-style ratio
    * (spread_i + spread_j) / d(i,j) — the number that says whether two
    * clusters have collapsed into each other (ratio high) or are
    * genuinely distinct (low). The partition/shuffle shape: one
    * per-dim centroid aggregate over the corpus (same as
    * [[centroids]]), then everything downstream — the k x k centroid
    * pair distances, the nearest-other argmin, the ratio — runs on
    * k x Dim rows, broadcast-sized at ANY corpus scale. Determinism:
    * spreads and pair distances accumulate on the 2^45 integer grid
    * (exact, order-independent); the single ratio division happens
    * once, in the same op order in both engines, then floors onto a
    * 2^20 grid.
    */
  val clusterSeparation: QueryDef = QueryDef.sql(
    "q_cluster_separation",
    s"""WITH $CentCte,
       |sp AS (SELECT ed.label, count(DISTINCT ed.vec_id) AS n_vecs,
       |              CAST(sum(CAST(floor((ed.x - cent.c) * (ed.x - cent.c) * $S45) AS BIGINT)) AS BIGINT) AS sumt
       |       FROM ed JOIN cent ON cent.label = ed.label AND cent.i = ed.i
       |       GROUP BY ed.label),
       |cd AS (SELECT c1.label AS label, c2.label AS olabel,
       |              CAST(sum(CAST(floor((c1.c - c2.c) * (c1.c - c2.c) * $S45) AS BIGINT)) AS BIGINT) AS d2q
       |       FROM cent c1 JOIN cent c2 ON c2.i = c1.i AND c2.label <> c1.label
       |       GROUP BY 1, 2),
       |nr AS (SELECT label, olabel, d2q FROM (
       |         SELECT label, olabel, d2q,
       |                row_number() OVER (PARTITION BY label ORDER BY d2q, olabel) AS rn
       |         FROM cd) WHERE rn = 1)
       |SELECT nr.label, CAST(s1.n_vecs AS BIGINT) AS n_vecs,
       |       nr.olabel AS nearest_label, nr.d2q AS d2q,
       |       CAST(floor((CAST(s1.sumt AS DOUBLE) / $S45 / s1.n_vecs
       |                   + CAST(s2.sumt AS DOUBLE) / $S45 / s2.n_vecs)
       |                  / (CAST(nr.d2q AS DOUBLE) / $S45) * 1048576.0) AS BIGINT) AS db_q
       |FROM nr
       |JOIN sp s1 ON s1.label = nr.label
       |JOIN sp s2 ON s2.label = nr.olabel""".stripMargin) { (spark, dir) =>
    val ed = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("label"), col("vec_id"), (col("i0") + 1).as("i"), col("x"),
        floor(col("x") * S52d).cast("long").as("ix"))
    val cent = ed.groupBy("label", "i")
      .agg((sum(col("ix").cast("decimal(38,0)")).cast("double") / S52d / count(lit(1))).as("c"))
    val centC = cent.withColumnRenamed("label", "clabel").withColumnRenamed("i", "ci")
    val sp = ed.join(centC, col("clabel") === col("label") && col("ci") === col("i"))
      .select(col("label"), col("vec_id"),
        floor((col("x") - col("c")) * (col("x") - col("c")) * S45d).cast("long").as("t"))
      .groupBy("label")
      .agg(countDistinct(col("vec_id")).as("n_vecs"), sum(col("t")).as("sumt"))
    val c2 = cent.select(col("label").as("olabel"), col("i").as("oi"), col("c").as("oc"))
    val cd = cent.join(broadcast(c2), col("oi") === col("i") && col("olabel") =!= col("label"))
      .select(col("label"), col("olabel"),
        floor((col("c") - col("oc")) * (col("c") - col("oc")) * S45d).cast("long").as("t"))
      .groupBy("label", "olabel")
      .agg(sum(col("t")).as("d2q"))
    val nr = cd
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("d2q").asc, col("olabel").asc)))
      .filter(col("rn") === 1)
      .select(col("label"), col("olabel"), col("d2q"))
    val s1 = sp.select(col("label").as("l1"), col("n_vecs"), col("sumt").as("sum1"))
    val s2 = sp.select(col("label").as("l2"), col("n_vecs").as("n2"), col("sumt").as("sum2"))
    nr.join(broadcast(s1), col("l1") === col("label"))
      .join(broadcast(s2), col("l2") === col("olabel"))
      .select(col("label"), col("n_vecs"),
        col("olabel").as("nearest_label"), col("d2q"),
        floor((col("sum1").cast("double") / S45d / col("n_vecs")
          + col("sum2").cast("double") / S45d / col("n2"))
          / (col("d2q").cast("double") / S45d) * 1048576.0).cast("long").as("db_q"))
  }

  /** Per-label centroid DRIFT between two deterministic corpus halves
    * (vec_id parity = "snapshot A" vs "snapshot B") — the
    * embedding-space drift monitor a re-embedding or model-update
    * pipeline checks before mixing vectors from two encoder runs: a
    * large squared centroid shift for a label means the two halves do
    * NOT come from the same distribution and ANN indexes / SemDeDup
    * thresholds tuned on A are stale for B. Same exactness recipe as
    * `q_centroid_spread`: per-dim sums on the 2^52 integer grid, the
    * one double division per (label, dim, half) in fixed op order,
    * squared diffs floor-quantized to 2^45 then summed as BIGINTs.
    * SCALE: one corpus reduce to labels x dims x 2 rows; all the diff
    * algebra runs on that broadcast-sized table.
    */
  val embedDrift: QueryDef = QueryDef.sql(
    "q_embed_drift",
    s"""WITH ed AS (SELECT vec_id % 2 AS half, label, i,
       |                   CAST(floor(embedding[i] * $S52) AS BIGINT) AS ix
       |            FROM embeddings, UNNEST(range(1, ${Dim + 1})) t(i)),
       |c AS (SELECT label, i, half, CAST(sum(ix) AS DOUBLE) / $S52 / count(*) AS c
       |      FROM ed GROUP BY label, i, half),
       |cnt AS (SELECT label, vec_id % 2 AS half, CAST(count(*) AS BIGINT) AS n
       |        FROM embeddings GROUP BY 1, 2),
       |t AS (SELECT a.label,
       |             CAST(floor((a.c - b.c) * (a.c - b.c) * $S45) AS BIGINT) AS tq
       |      FROM c a JOIN c b ON a.label = b.label AND a.i = b.i
       |       AND a.half = 0 AND b.half = 1)
       |SELECT t.label, na.n AS n_a, nb.n AS n_b,
       |       CAST(sum(t.tq) AS DOUBLE) / $S45 AS drift2
       |FROM t JOIN cnt na ON na.label = t.label AND na.half = 0
       |       JOIN cnt nb ON nb.label = t.label AND nb.half = 1
       |GROUP BY t.label, na.n, nb.n""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val ed = emb
      .select((col("vec_id") % 2).as("half"), col("label"),
        posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("half"), col("label"), (col("i0") + 1).cast("long").as("i"),
        floor(col("x") * S52d).cast("long").as("ix"))
    val c = ed.groupBy("label", "i", "half")
      .agg((sum(col("ix").cast("decimal(38,0)")).cast("double") / S52d / count(lit(1))).as("c"))
    val cnt = emb.groupBy(col("label"), (col("vec_id") % 2).as("half"))
      .agg(count(lit(1)).as("n"))
    val a = c.filter(col("half") === 0)
      .select(col("label").as("alabel"), col("i").as("ai"), col("c").as("ca"))
    val b = c.filter(col("half") === 1)
      .select(col("label").as("blabel"), col("i").as("bi"), col("c").as("cb"))
    val t = a.join(b, col("alabel") === col("blabel") && col("ai") === col("bi"))
      .select(col("alabel").as("label"),
        floor((col("ca") - col("cb")) * (col("ca") - col("cb")) * S45d)
          .cast("long").as("tq"))
    val na = cnt.filter(col("half") === 0).select(col("label").as("nalabel"), col("n").as("n_a"))
    val nb = cnt.filter(col("half") === 1).select(col("label").as("nblabel"), col("n").as("n_b"))
    t.join(broadcast(na), col("nalabel") === col("label"))
      .join(broadcast(nb), col("nblabel") === col("label"))
      .groupBy(col("label"), col("n_a"), col("n_b"))
      .agg((sum(col("tq")).cast("double") / S45d).as("drift2"))
  }

  /** Quantized 1/log2(r+1) DCG weights for ranks 1..10 (×2^40) and
    * their sum (the ideal DCG for 10 binary-relevant results). FIXED
    * literals — no runtime libm call, so both engines share them by
    * construction.
    */
  private val DcgW = Seq(1099511627776L, 693714600361L, 549755813888L,
    473533883412L, 425349159792L, 391653944122L, 366503875925L,
    346857300180L, 330985980541L, 317830137717L)
  private val Idcg = DcgW.sum // 4995696323714

  /** RANKING-QUALITY eval of the 1-probe IVF search: nDCG@10 and MRR
    * against the exact brute-force top-10 per query — the standard
    * retrieval metrics next to the recall evals (`q_knn_recall`,
    * `q_pq_recall` measure set overlap; nDCG/MRR grade the ORDER the
    * approximate index returns). Relevance is binary (∈ exact top-10);
    * DCG terms use a fixed 2^40-quantized 1/log2(r+1) weight table, so
    * the whole metric is integer arithmetic — ndcg_bp = dcg·10⁴ DIV
    * ideal-DCG, rr_q20 = 2^20 DIV first-relevant-rank.
    *
    * SCALE: truth is the `q_ann_topk` brute-force shape (tiny query
    * batch broadcast, rank-limit pushed via WindowGroupLimit); the
    * approximate side touches only the probed label partition through
    * an equi-join. The metric join runs on ≤ 10×10 result rows.
    */
  val annNdcg: QueryDef = QueryDef.sql(
    "q_ann_ndcg",
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e WHERE vec_id < 10),
       |tr AS (SELECT qid, vec_id AS nid,
       |              row_number() OVER (PARTITION BY qid
       |                                 ORDER BY ${cosDistSql("v", "qv")}, vec_id) AS rank
       |       FROM e, q WHERE vec_id <> qid),
       |t AS (SELECT qid, nid FROM tr WHERE rank <= 10),
       |ar AS (SELECT q.qid, e.vec_id AS nid,
       |              row_number() OVER (PARTITION BY q.qid
       |                                 ORDER BY ${cosDistSql("e.v", "q.qv")}, e.vec_id) AS rank
       |       FROM e JOIN q ON e.label = q.qlabel AND e.vec_id <> q.qid),
       |a10 AS (SELECT * FROM ar WHERE rank <= 10),
       |rel AS (SELECT a.qid, a.rank,
       |               CASE WHEN t.nid IS NULL THEN 0 ELSE 1 END AS rel
       |        FROM a10 a LEFT JOIN t ON t.qid = a.qid AND t.nid = a.nid),
       |m AS (SELECT qid, CAST(sum(rel) AS BIGINT) AS n_rel,
       |             CAST(sum(rel * ([${DcgW.mkString(", ")}])[rank]) AS BIGINT) AS dcg,
       |             CAST(coalesce(min(CASE WHEN rel = 1 THEN rank END), 0) AS BIGINT) AS fr
       |      FROM rel GROUP BY qid)
       |SELECT qid, n_rel,
       |       CAST((dcg * 10000) // $Idcg AS BIGINT) AS ndcg_bp,
       |       CAST(CASE WHEN fr = 0 THEN 0 ELSE 1048576 // fr END AS BIGINT) AS rr_q20
       |FROM m""".stripMargin) { (spark, dir) =>
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("nid").asc)
    val t = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosineDistance(col("embedding"), col("qv")).as("dist"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select(col("qid").as("tqid"), col("nid").as("tnid"))
    val a10 = e.join(broadcast(q),
        col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosineDistance(col("embedding"), col("qv")).as("dist"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
    val wlit = array(DcgW.map(lit): _*)
    val rel = a10.join(t, col("tqid") === col("qid") && col("tnid") === col("nid"), "left")
      .select(col("qid"), col("rank"),
        when(col("tnid").isNull, 0L).otherwise(1L).as("rel"))
    rel.groupBy("qid").agg(
        sum("rel").cast("long").as("n_rel"),
        sum(col("rel") * element_at(wlit, col("rank"))).cast("long").as("dcg"),
        coalesce(min(when(col("rel") === 1, col("rank"))), lit(0)).cast("long").as("fr"))
      .select(col("qid"), col("n_rel"),
        expr(s"CAST((dcg * 10000) DIV $Idcg AS BIGINT)").as("ndcg_bp"),
        expr("CAST(CASE WHEN fr = 0 THEN 0 ELSE 1048576 DIV fr END AS BIGINT)").as("rr_q20"))
  }

  /** SIMPLIFIED SILHOUETTE per label cluster — the third member of the
    * cluster-quality triad ([[centroidSpread]] = cohesion,
    * [[clusterSeparation]] = Davies-Bouldin separation, this =
    * per-POINT assignment quality): for every vector, a = squared L2 to
    * its OWN centroid, b = min squared L2 to any OTHER centroid,
    * s = (b−a)/max(a,b) ∈ [−1,1] (negative ⇒ the point sits closer to a
    * foreign centroid — a mis-clustered point the other two metrics
    * average away). Reported per label: n, mean, min, max of s in Q20.
    * Determinism: per-dim squared terms floor onto the 2^45 grid and
    * sum as exact integers; the one division per point happens on those
    * exact integers in the same op order in both engines.
    *
    * SCALE: the point×centroid distance table is N·k rows AFTER partial
    * aggregation (the N·Dim·k join input combines map-side; centroids
    * are k·Dim, broadcast); everything past it is a per-point reduce
    * then a k-row aggregate. This is the brute-force silhouette shape —
    * linear in N with a k·Dim constant, the honest cost of the metric.
    */
  val silhouette: QueryDef = QueryDef.sql(
    "q_silhouette",
    s"""WITH $CentCte,
       |d AS (SELECT ed.vec_id, ed.label, cent.label AS olabel,
       |             CAST(sum(CAST(floor((ed.x - cent.c) * (ed.x - cent.c) * $S45) AS BIGINT)) AS BIGINT) AS d2
       |      FROM ed JOIN cent ON cent.i = ed.i
       |      GROUP BY 1, 2, 3),
       |ab AS (SELECT vec_id, label,
       |              max(CASE WHEN olabel = label THEN d2 END) AS a,
       |              min(CASE WHEN olabel <> label THEN d2 END) AS b
       |       FROM d GROUP BY 1, 2),
       |s AS (SELECT vec_id, label,
       |             CAST(floor(CAST(b - a AS DOUBLE) / greatest(a, b, CAST(1 AS BIGINT))
       |                        * 1048576) AS BIGINT) AS s_q20
       |      FROM ab)
       |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       |       CAST(floor(CAST(sum(s_q20) AS DOUBLE) / count(*)) AS BIGINT) AS mean_s_q20,
       |       CAST(min(s_q20) AS BIGINT) AS min_s_q20,
       |       CAST(max(s_q20) AS BIGINT) AS max_s_q20
       |FROM s GROUP BY 1""".stripMargin) { (spark, dir) =>
    // ed feeds the centroid build AND the distance join — one explode
    // pass (round 16; durability: round-12 ledger class)
    val ed = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("label"), col("vec_id"), (col("i0") + 1).as("i"), col("x"))
      .localCheckpoint()
    val cent = ed
      .select(col("label"), col("i"), floor(col("x") * S52d).cast("long").as("ix"))
      .groupBy("label", "i")
      .agg((sum(col("ix").cast("decimal(38,0)")).cast("double") / S52d / count(lit(1))).as("c"))
      .select(col("label").as("olabel"), col("i"), col("c"))
    val d = ed.join(broadcast(cent), "i")
      .select(col("vec_id"), col("label"), col("olabel"),
        floor((col("x") - col("c")) * (col("x") - col("c")) * S45d).cast("long").as("t"))
      .groupBy("vec_id", "label", "olabel").agg(sum("t").as("d2"))
    val ab = d.groupBy("vec_id", "label")
      .agg(max(when(col("olabel") === col("label"), col("d2"))).as("a"),
        min(when(col("olabel") =!= col("label"), col("d2"))).as("b"))
    ab.select(col("label"),
        floor((col("b") - col("a")).cast("double")
          / greatest(col("a"), col("b"), lit(1L)) * 1048576).cast("long").as("s_q20"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        // floor of a double quotient, NOT integer DIV: s_q20 sums can be
        // negative, where Spark's DIV truncates toward zero but DuckDB's
        // // floors — the one engine-semantics divergence in this family
        expr("CAST(floor(CAST(sum(s_q20) AS DOUBLE) / count(*)) AS BIGINT)").as("mean_s_q20"),
        min("s_q20").as("min_s_q20"), max("s_q20").as("max_s_q20"))
  }

  /** LOCAL INTRINSIC DIMENSIONALITY (MLE of Levina & Bickel / the LID
    * of Houle et al.) per query point from its exact k-NN distance
    * profile: LID = −k / Σᵢ ln(dᵢ/dₖ). Low LID ⇒ the neighborhood lies
    * near a low-dimensional manifold and ANN indexes will do well; high
    * LID ⇒ distances concentrate and pruning stops working — the
    * complement of `q_knn_hubness` (which diagnoses the GRAPH, this
    * diagnoses the GEOMETRY). Determinism: each ln ratio floors onto
    * the 2^40 grid before the per-query integer sum; the final
    * −k·2^40/Σ division runs once on exact integers, then floors to
    * Q20. SCALE: the brute-force distance table is the `q_ann_topk`
    * shape (tiny broadcast query side × partitioned vectors,
    * per-query window top-k), then k-bounded per-query math.
    */
  val annLid: QueryDef = QueryDef.sql(
    "q_ann_lid",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
       |d AS (SELECT qid, vec_id AS nid, ${cosDistSql("v", "qv")} AS dist
       |      FROM e, q WHERE vec_id <> qid),
       |r AS (SELECT qid, nid, dist,
       |             row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rank
       |      FROM d WHERE dist > 0),
       |topk AS (SELECT qid, dist, rank FROM r WHERE rank <= 16),
       |dk AS (SELECT qid, max(dist) AS dk FROM topk GROUP BY 1),
       |terms AS (SELECT t.qid,
       |                 CAST(floor(ln(t.dist / dk.dk) * 1099511627776) AS BIGINT) AS t_q40
       |          FROM topk t JOIN dk USING (qid)),
       |agg AS (SELECT qid, CAST(sum(t_q40) AS BIGINT) AS s_q40, count(*) AS k
       |        FROM terms GROUP BY 1)
       |SELECT a.qid, CAST(a.k AS BIGINT) AS k, dk.dk,
       |       CAST(floor((CAST(-a.k AS DOUBLE) * 1099511627776 / a.s_q40) * 1048576)
       |            AS BIGINT) AS lid_q20
       |FROM agg a JOIN dk USING (qid) WHERE a.s_q40 < 0""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id").asc)
    val topk = emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dist", cosineDistance(col("embedding"), col("qv")))
      .filter(col("dist") > 0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 16)
      .select(col("qid"), col("dist"))
    val dk = topk.groupBy("qid").agg(max("dist").as("dk"))
    val agg = topk.join(broadcast(dk), "qid")
      .select(col("qid"),
        floor(log(col("dist") / col("dk")) * lit(1099511627776.0)).cast("long").as("t_q40"))
      .groupBy("qid")
      .agg(sum("t_q40").cast("long").as("s_q40"), count(lit(1)).as("k"))
    agg.join(broadcast(dk), "qid").filter(col("s_q40") < 0)
      .select(col("qid"), col("k").cast("long").as("k"), col("dk"),
        floor((-col("k")).cast("double") * lit(1099511627776.0) / col("s_q40")
          * lit(1048576.0)).cast("long").as("lid_q20"))
  }

  val all: Seq[QueryDef] = Seq(annTopk, annNdcg, centroids, centroidSpread, ivfTopk,
    ivfPruned, ivfNprobe, ivfKmeans, kmeans, centroidClassify, embedOutliers,
    clusterSeparation, embedDrift, silhouette, annLid)
}
