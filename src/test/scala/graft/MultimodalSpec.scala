package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "some text payload"), (2L, "x" * 3000)).toDF("id", "t"), "id", "t")

  test("fromText wraps rows as typed media blobs") {
    val r = media.orderBy("media_id").collect()
    assert(r(0).getAs[Array[Byte]]("bytes").length == 17)
    assert(r(0).getAs[org.apache.spark.sql.Row]("meta").getLong(0) == 17L)
    assert(r(0).getString(1) == "image/fake")
  }

  test("featurize produces fixed-dim deterministic features, drops blobs") {
    val f = Multimodal.featurize(media, Multimodal.StubDecoder)
    assert(f.columns.toSeq == Seq("media_id", "media_type", "n_bytes", "features"))
    val rows = f.orderBy("media_id").collect()
    assert(rows.forall(_.getSeq[Float](3).size == Multimodal.FeatureDim))
    // determinism: same input -> same features
    val again = Multimodal.featurize(media, Multimodal.StubDecoder)
      .orderBy("media_id").collect()
    assert(rows.map(_.getSeq[Float](3)).toSeq == again.map(_.getSeq[Float](3)).toSeq)
  }

  test("sampleFrames explodes 1KiB blocks at the stride") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 2), 2)
    val idx = frames.select("frame_idx").as[Int].collect().sorted.toSeq
    assert(idx == Seq(0, 2)) // 3000 bytes -> blocks 0,1,2 -> stride 2 keeps 0,2
  }
}
