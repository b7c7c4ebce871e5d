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
    val got = graft.streaming.TokenizerStreams.encodedDocs(
      Tables(spark, sf0001, "documents").select("doc_id", "text"), m2, v2)
    val want = SparkEntry.queries("q_bpe_encode")(spark, sf0001)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
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
