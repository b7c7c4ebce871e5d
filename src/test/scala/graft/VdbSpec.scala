package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Vdb

class VdbSpec extends SparkSpec {
  import spark.implicits._

  test("serialize/deserialize round-trip preserves rows and layout") {
    val rows = Seq(("first chunk", Array(1.0, 2.5, -3.25)), ("second", Array(0.0, -1.0, 4.5)))
    val bytes = Vdb.serialize(rows.iterator)
    // header: magic, type=double, n=2, dim=3
    assert(bytes.slice(0, 4).sameElements(Vdb.Magic))
    assert(bytes(4) == Vdb.TypeDouble)
    val back = Vdb.deserialize(bytes)
    assert(back.map(_._1) == rows.map(_._1))
    assert(back.map(_._2.toSeq) == rows.map(_._2.toSeq))
    // total size: 21 + 2*3*8 + (8+11) + (8+6)
    assert(bytes.length == 21 + 48 + 19 + 14)
  }

  test("binary-vector type tag unpacks bit-packed rows (vector-db.c:58-60/111-113)") {
    // hand-craft a BINARY_VECTOR file: dim=10 -> 2 bytes/row, 1 row
    val bb = java.nio.ByteBuffer.allocate(21 + 2 + 8 + 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(Vdb.Magic); bb.put(Vdb.TypeBinary)
    bb.putLong(1L); bb.putLong(10L)
    bb.put(Array[Byte](0x05, 0x02)) // bits 0,2 set; bit 9 set
    bb.putLong(3L); bb.put("abc".getBytes)
    val rows = Vdb.deserialize(bb.array())
    assert(rows.head._1 == "abc")
    assert(rows.head._2.toSeq == Seq(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0))
  }

  test("binary-vector write round-trips (vector-db.c:55-60)") {
    // dim=10 -> 2 packed bytes/row; values are 0/1 doubles as produced by
    // the deserializer, sign convention v(i) > 0
    val rows = Seq(
      ("bin a", Array(1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0)),
      ("bin b", Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0)))
    val bytes = Vdb.serialize(rows.iterator, Vdb.TypeBinary)
    assert(bytes(4) == Vdb.TypeBinary)
    assert(bytes.length == 21 + 2 * 2 + (8 + 5) + (8 + 5))
    // row 0 packs to exactly the hand-crafted layout of the read test
    assert(bytes.slice(21, 23).sameElements(Array[Byte](0x05, 0x02)))
    val back = Vdb.deserialize(bytes)
    assert(back.map(_._1) == rows.map(_._1))
    assert(back.map(_._2.toSeq) == rows.map(_._2.toSeq))
  }

  test("binary writeDir/readDir round-trip through Spark") {
    val dir = Files.createTempDirectory("vdbbin").toString
    val df = Seq((0L, "pk a", Seq(1.0, 0.0, 1.0, 1.0)), (1L, "pk b", Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("id", "text", "embedding")
    Vdb.writeDir(df, "text", "embedding", dir, Vdb.TypeBinary)
    val got = Vdb.readDir(spark, dir).orderBy("text")
      .as[(String, Seq[Double])].collect().toSeq
    assert(got == Seq(("pk a", Seq(1.0, 0.0, 1.0, 1.0)), ("pk b", Seq(0.0, 1.0, 0.0, 0.0))))
  }

  test("bad magic is warn-only, read proceeds (vector-db.c:102-105)") {
    val bytes = Vdb.serialize(Seq(("t", Array(1.0))).iterator)
    bytes(0) = 'X'.toByte
    assert(Vdb.deserialize(bytes).head._1 == "t")
  }

  test("writeDir/readDir round-trip through Spark") {
    val dir = Files.createTempDirectory("vdbspec").toString
    val df = Seq((0L, "alpha", Seq(0.5, 1.5)), (1L, "beta", Seq(-0.5, 2.0)))
      .toDF("id", "text", "embedding")
    Vdb.writeDir(df, "text", "embedding", dir)
    val back = Vdb.readDir(spark, dir)
    assert(back.count() == 2)
    val got = back.orderBy("text").as[(String, Seq[Double])].collect().toSeq
    assert(got == Seq(("alpha", Seq(0.5, 1.5)), ("beta", Seq(-0.5, 2.0))))
  }

  test("DataSource V2: spark.read.format over a .vdb directory") {
    val dir = java.nio.file.Files.createTempDirectory("vdbdsv2").toString
    val df = Seq((0L, "dsv2 row a", Seq(1.0, 2.0)), (1L, "dsv2 row b", Seq(3.0, 4.0)))
      .toDF("id", "text", "embedding")
    Vdb.writeDir(df, "text", "embedding", dir)
    val back = spark.read.format("graft.sources.VdbDataSource").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("text", "embedding"))
    val got = back.orderBy("text").as[(String, Seq[Double])].collect().toSeq
    assert(got == Seq(("dsv2 row a", Seq(1.0, 2.0)), ("dsv2 row b", Seq(3.0, 4.0))))
    // projection prunes to one column without error
    assert(back.select("text").as[String].collect().sorted.toSeq ==
      Seq("dsv2 row a", "dsv2 row b"))
  }

  test("DataSource V2 write: save/overwrite round-trips, binary option") {
    val dir = Files.createTempDirectory("vdbdsv2w").toString
    val df = Seq(("w a", Seq(1.0, -2.0)), ("w b", Seq(-3.0, 4.0))).toDF("text", "embedding")
    df.write.format("graft.sources.VdbDataSource").mode("append").save(dir)
    // overwrite replaces, not appends
    df.write.format("graft.sources.VdbDataSource").mode("overwrite").save(dir)
    val back = spark.read.format("graft.sources.VdbDataSource").load(dir)
      .orderBy("text").as[(String, Seq[Double])].collect().toSeq
    assert(back == Seq(("w a", Seq(1.0, -2.0)), ("w b", Seq(-3.0, 4.0))))
    // binary type tag: signs survive as 0/1
    val bdir = Files.createTempDirectory("vdbdsv2b").toString
    df.write.format("graft.sources.VdbDataSource").option("vdbtype", "binary")
      .mode("overwrite").save(bdir)
    val bin = spark.read.format("graft.sources.VdbDataSource").load(bdir)
      .orderBy("text").as[(String, Seq[Double])].collect().toSeq
    assert(bin == Seq(("w a", Seq(1.0, 0.0)), ("w b", Seq(0.0, 1.0))))
  }

  test("writeSingle produces a single reference-layout file") {
    val f = Files.createTempFile("one", ".vdb").toString
    val df = Seq(("only row", Seq(7.0, 8.0))).toDF("text", "embedding")
    Vdb.writeSingle(df, "text", "embedding", f)
    val back = Vdb.deserialize(Files.readAllBytes(java.nio.file.Paths.get(f)))
    assert(back.size == 1)
    assert(back.head._1 == "only row")
    assert(back.head._2.toSeq == Seq(7.0, 8.0))
  }

  test("DataSource V2 append adds to existing data instead of clobbering") {
    val dir = Files.createTempDirectory("vdbdsv2a").toString
    Seq(("job1 row", Seq(1.0, 2.0))).toDF("text", "embedding")
      .write.format("graft.sources.VdbDataSource").mode("append").save(dir)
    Seq(("job2 row", Seq(3.0, 4.0))).toDF("text", "embedding")
      .write.format("graft.sources.VdbDataSource").mode("append").save(dir)
    val back = spark.read.format("graft.sources.VdbDataSource").load(dir)
      .orderBy("text").as[(String, Seq[Double])].collect().toSeq
    assert(back == Seq(("job1 row", Seq(1.0, 2.0)), ("job2 row", Seq(3.0, 4.0))))
    // no write spool left behind
    val leftovers = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("_temp"))
    assert(leftovers.isEmpty)
  }
}
