package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-ingestion formats beyond parquet: JSONL (the lingua franca of
  * text-corpus interchange) and CSV, both with explicit schemas (never
  * inference at scale — one pass saved, deterministic types) and
  * PERMISSIVE corrupt-record capture so a bad line quarantines instead
  * of killing a 100 TB ingest.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL: explicit schema, corrupt lines quarantined not fatal") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.writeString(Paths.get(s"$dir/part0.jsonl"),
      """{"doc_id": 1, "text": "alpha beta"}
        |{"doc_id": 2, "text": "gamma"}
        |{not json at all
        |{"doc_id": 4, "text": "delta"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache() // cache: corrupt-record access needs the raw row
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    val good = df.filter(col("_corrupt_record").isNull).select("doc_id", "text")
    assert(good.as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "alpha beta"), (2L, "gamma"), (4L, "delta")))
    // and straight into the engine: chunk + embed the JSONL corpus
    val idx = graft.pipelines.IndexBuild.build(
      good, "doc_id", "text", 8, graft.pipelines.MockEmbedder)
    assert(idx.count() >= 3 && idx.schema.fieldNames.contains("embedding"))
    df.unpersist()
  }

  test("CSV: explicit schema with quoted fields round-trips") {
    val dir = Files.createTempDirectory("csvsrc").toString
    Files.writeString(Paths.get(s"$dir/docs.csv"),
      "doc_id,text\n1,\"comma, inside\"\n2,plain\n")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(df.as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "comma, inside"), (2L, "plain")))
  }

  test("ORC: columnar round-trip with filter pushdown to the scan") {
    val dir = Files.createTempDirectory("orcsrc").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("doc_id") < 10)
    assert(back.count() == docs.filter(col("doc_id") < 10).count())
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("LessThan(doc_id,10)"), s"filter not pushed to ORC scan:\n$scan")
  }
}
