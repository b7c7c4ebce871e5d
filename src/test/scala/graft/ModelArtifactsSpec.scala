package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Cross-session artifact round-trips: train once, WRITE the artifact,
  * LOAD it back, and pin that inference over the loaded artifact equals
  * the in-session training path exactly — the deployment shape where a
  * training job and its inference consumers never share a JVM.
  */
class ModelArtifactsSpec extends SparkSpec {

  test("quality weights: save -> load -> score equals q_quality_logreg exactly") {
    val path = Files.createTempDirectory("qweights").toString + "/w.parquet"
    val w = graft.queries.CurationQueries33.learnedWeights(
      graft.queries.CurationQueries33.featuresOf(
        Tables(spark, sf0001, "documents")))
    graft.pipelines.ModelArtifacts.saveWeights(spark, w.toSeq, path)
    val loaded = graft.pipelines.ModelArtifacts.loadWeights(spark, path)
    assert(loaded.sameElements(w), "weights must round-trip bit-for-bit")
    // a "different session" consumer: the streaming scorer fed the
    // LOADED artifact must equal the registry inference query
    val got = graft.streaming.QualityStreams.scoredDocs(
      Tables(spark, sf0001, "documents").select("doc_id", "text"), loaded.toSeq)
    val want = SparkEntry.queries("q_quality_logreg")(spark, sf0001)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("tokenizer artifacts: save -> load -> encode equals q_bpe_encode exactly") {
    val base = Files.createTempDirectory("bpeart").toString
    val (merges, vocab) =
      graft.queries.TextStatsQueries.tokenizerArtifacts(spark, sf0001)
    graft.pipelines.ModelArtifacts.saveMerges(spark, merges, s"$base/merges.parquet")
    graft.pipelines.ModelArtifacts.saveVocab(spark, vocab, s"$base/vocab.parquet")
    val m2 = graft.pipelines.ModelArtifacts.loadMerges(spark, s"$base/merges.parquet")
    val v2 = graft.pipelines.ModelArtifacts.loadVocab(spark, s"$base/vocab.parquet")
    assert(m2 == merges, "merge table must round-trip in learned order")
    assert(v2 == vocab, "vocab must round-trip")
    // n_unk is streaming-only observability (round 13); the batch
    // columns must still match q_bpe_encode exactly, and the training
    // corpus carries no OOV so n_unk is identically zero
    val enc = graft.streaming.TokenizerStreams.encodedDocs(
      Tables(spark, sf0001, "documents").select("doc_id", "text"), m2, v2)
    assert(enc.filter(org.apache.spark.sql.functions.col("n_unk") =!= 0).count() == 0)
    val got = enc.select("doc_id", "n_tok", "id_sum", "id_posw", "chars_per_tok_q")
    val want = SparkEntry.queries("q_bpe_encode")(spark, sf0001)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("ivf codebook: save -> load -> probe equals q_ivf_kmeans exactly") {
    // the build-once serve-many split for the coarse quantizer: the
    // probe session builds its index and answers from the LOADED
    // centroid artifact, never re-running the Lloyd chain
    val path = Files.createTempDirectory("ivfart").toString + "/centroids.parquet"
    val trained = graft.queries.AnnQueries.ivfCodebook(spark, sf0001)
    graft.pipelines.ModelArtifacts.saveCentroids(spark, trained, path)
    val loaded = graft.pipelines.ModelArtifacts.loadCentroids(spark, path)
    // doubles must round-trip bit-for-bit (IEEE754 through parquet)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cluster").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toList)).toList
    assert(canon(loaded) == canon(trained), "centroids must round-trip exactly")
    // serve from the artifact: index build + nearest-centroid probe +
    // exact re-rank, the q_ivf_kmeans tail, fed ONLY by `loaded`
    val emb = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val indexDir = Files.createTempDirectory("ivfserve").toString + "/idx"
    graft.operators.IvfIndex.build(emb, loaded, indexDir)
    val qvec = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val best = graft.operators.IvfIndex.nearestClusters(loaded, qvec, 1)
    val qlit = array(qvec.map(lit): _*)
    val got = graft.operators.IvfIndex.probe(spark, indexDir, best)
      .filter(col("vec_id") =!= 0)
      .withColumn("dist",
        graft.functions.VectorFunctions.cosineDistance(col("embedding"), qlit))
      .orderBy(col("dist").asc, col("vec_id").asc).limit(5)
      .select(col("cluster").cast("long").as("probe_cluster"),
        col("vec_id").as("nid"), col("dist"))
    val want = SparkEntry.queries("q_ivf_kmeans")(spark, sf0001)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "loaded-artifact probe must equal the in-session train+probe path")
  }

  test("pq codebook: save -> load -> encode equals q_pq_codes exactly") {
    val path = Files.createTempDirectory("pqart").toString + "/codebook.parquet"
    val emb = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val sub = graft.queries.PqQueries.subspaces(emb)
    val trained = graft.queries.PqQueries.codebookOf(sub)
    graft.pipelines.ModelArtifacts.savePqCodebook(spark, trained, path)
    val loaded = graft.pipelines.ModelArtifacts.loadPqCodebook(spark, path)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cm", "code").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toList)).toList
    assert(canon(loaded.select(col("cm"), col("code"), col("cv")))
      == canon(trained.select(col("cm"), col("code"), col("cv"))),
      "PQ codebook must round-trip exactly")
    val got = graft.queries.PqQueries.pqAssignWith(sub, loaded)
    val want = SparkEntry.queries("q_pq_codes")(spark, sf0001)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "loaded-codebook encode must equal the in-session encode")
  }

  test("quality weights artifact query: hash-identical to q_quality_logreg") {
    val got = SparkEntry.queries("q_quality_score_artifact")(spark, sf0001)
    val want = SparkEntry.queries("q_quality_logreg")(spark, sf0001)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "artifact-backed scoring must equal in-session scoring")
  }

  test("kcenter coreset: save -> load round-trips; loaded centers certify coverage") {
    val path = Files.createTempDirectory("coreset").toString + "/coreset.parquet"
    val want = SparkEntry.queries("q_kcenter_coreset")(spark, sf0001)
    graft.pipelines.ModelArtifacts.saveCoreset(spark, want, path)
    val loaded = graft.pipelines.ModelArtifacts.loadCoreset(spark, path)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("step").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(canon(loaded) == canon(want), "coreset must round-trip exactly")
    // SERVE from the artifact: fetch center vectors by id (the
    // id-selector convention — k-row semi-join against the corpus) and
    // check the 2-approximation certificate the artifact carries: every
    // point's nearest-center distance is <= the final pick's radius
    // (greedy farthest-first picks the WORST point each round, so the
    // last radius bounds all remaining points)
    val q20 = 1048576.0
    val emb = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * lit(q20)).cast("long")).as("e"))
    val centers = emb.join(loaded.select(col("picked").as("vec_id")), "vec_id")
      .collect().map(_.getSeq[Long](1).toArray)
    val mind = centers.map(c =>
      aggregate(zip_with(col("e"), typedLit(c.toSeq),
        (x, y) => (x - y) * (x - y)), lit(0L), (a, b) => a + b))
      .reduce(least(_, _))
    val maxMin = emb.agg(max(mind)).collect()(0).getLong(0)
    val lastRadius = canon(loaded).last._3
    assert(maxMin <= lastRadius,
      s"coverage certificate violated: max min-dist $maxMin > radius $lastRadius")
  }

  test("trajectory determinism: memo-cleared retrain reproduces identical weights") {
    // the memo's correctness precondition, checked directly: training
    // is a pure function of (dir, split) — clear the session memo,
    // retrain from scratch, demand bit-identical trajectories
    val w1 = SparkEntry.queries("q_quality_train")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    graft.queries.CurationQueries33.clearSessionMemo()
    val w2 = SparkEntry.queries("q_quality_train")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(w1.sameElements(w2), "retraining must be deterministic")
  }
}
