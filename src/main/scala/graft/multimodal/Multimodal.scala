package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata; decode/feature-extract runs in
  * batched per-partition workers.
  *
  * The actual media decoders are NOT available in this environment, so
  * the decode step is a clearly-marked deterministic STUB
  * ([[StubDecoder]]); everything around it — schema, partitioning, batch
  * shape, the worker loop — is real and tested. To productionize, swap
  * [[Decoder]] for one backed by an image/audio library; nothing else
  * changes.
  *
  * Scale notes: media bytes never pass through a shuffle (featurize is a
  * mapPartitions in the scan stage); at 100 TB keep media in its own
  * column family / file set and join features by id instead of carrying
  * blobs through the pipeline.
  */
object Multimodal {

  val FeatureDim = 16

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("declared_width", IntegerType, nullable = true),
      StructField("declared_height", IntegerType, nullable = true))), nullable = false)))

  /** A pluggable media decoder: bytes → fixed-dim float features. */
  trait Decoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): Array[Float]
  }

  /** STUB: deterministic fake features from a rolling byte hash — stands
    * in for a real image/audio decoder (none available in this
    * container). Real Spark-side contract; fake math inside.
    */
  object StubDecoder extends Decoder {
    def decode(mediaType: String, bytes: Array[Byte]): Array[Float] = {
      var h = 1125899906842597L
      bytes.foreach(b => h = h * 31 + (b & 0xff))
      Array.tabulate(FeatureDim) { d =>
        val x = h * (2 * d + 3) + 17 * d
        ((x % 100003 + 100003) % 100003).toFloat / 100003f - 0.5f
      }
    }
  }

  /** Fixture builder: wrap a (id, text) frame as fake media rows. */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               mediaType: String = "image/fake"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(textCol).cast("binary").as("bytes"))
      .withColumn("meta", struct(
        length(col("bytes")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("declared_width"),
        lit(null).cast("int").as("declared_height")))

  /** Batched feature extraction: one decoder instance per partition,
    * media bytes dropped from the output (features + meta only).
    */
  def featurize(media: DataFrame, decoder: Decoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val (idI, tyI, byI) = (media.schema.fieldIndex("media_id"),
      media.schema.fieldIndex("media_type"), media.schema.fieldIndex("bytes"))
    media.mapPartitions { rows =>
      // per-partition worker: decoder state initialized once, rows batched
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](byI)
        Row(r.getLong(idI), r.getString(tyI), bytes.length.toLong,
          decoder.decode(r.getString(tyI), bytes).toSeq)
      }
    }(enc)
  }

  /** Frame sampling stub for "video" media: every `stride`-th 1 KiB block
    * becomes one frame row (media_id, frame_idx, frame_bytes). The real
    * implementation would demux containers; the 1→N row shape, schema and
    * partitioning are what the engine contributes.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val block = 1024
    val frameUdf = udf { bytes: Array[Byte] =>
      bytes.grouped(block).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (b, i) => (i, b) }.toSeq
    }
    media.select(col("media_id"), explode(frameUdf(col("bytes"))).as("f"))
      .select(col("media_id"), col("f._1").as("frame_idx"), col("f._2").as("frame_bytes"))
  }
}
