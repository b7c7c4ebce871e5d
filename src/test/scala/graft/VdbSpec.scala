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

  test("compact merges index dirs, drops exact duplicates, controls part count") {
    val dirA = Files.createTempDirectory("vdbcompactA").toString
    val dirB = Files.createTempDirectory("vdbcompactB").toString
    val out = Files.createTempDirectory("vdbcompactOut").toString
    // two incremental indexes sharing one re-embedded chunk ("beta")
    Vdb.writeDir(Seq(("alpha", Seq(0.5, 1.5)), ("beta", Seq(-0.5, 2.0)))
      .toDF("text", "embedding").repartition(2), "text", "embedding", dirA)
    Vdb.writeDir(Seq(("beta", Seq(-0.5, 2.0)), ("gamma", Seq(3.0, 4.0)))
      .toDF("text", "embedding").repartition(2), "text", "embedding", dirB)
    Vdb.compact(spark, Seq(dirA, dirB), out, targetParts = 1)
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".vdb")) == 1)
    val got = Vdb.readDir(spark, out).orderBy("text")
      .as[(String, Seq[Double])].collect().toSeq
    assert(got == Seq(("alpha", Seq(0.5, 1.5)), ("beta", Seq(-0.5, 2.0)),
      ("gamma", Seq(3.0, 4.0))))
    // re-compacting into a dir that already holds parts must FAIL, not
    // leave stale higher-numbered parts for readDir to union back in
    val err = intercept[IllegalArgumentException] {
      Vdb.compact(spark, Seq(dirA, dirB), out, targetParts = 1)
    }
    assert(err.getMessage.contains("stale"))
  }

  test("compact preserves the input type tag (TypeAuto detection)") {
    val dirBin = Files.createTempDirectory("vdbcompactBin").toString
    val out = Files.createTempDirectory("vdbcompactBinOut").toString
    Vdb.writeDir(Seq(("sign test", Seq(0.5, -1.5, 2.0)))
      .toDF("text", "embedding"), "text", "embedding", dirBin, Vdb.TypeBinary)
    Vdb.compact(spark, Seq(dirBin), out, targetParts = 1)
    // output header carries the binary tag, not a silent 64x double inflation
    val part = new java.io.File(out).listFiles().filter(_.getName.endsWith(".vdb")).head
    val in = new java.io.FileInputStream(part)
    val head = try { val h = new Array[Byte](5); in.read(h); h } finally in.close()
    assert(head(4) == Vdb.TypeBinary)
    val got = Vdb.readDir(spark, out).as[(String, Seq[Double])].collect().toSeq
    assert(got == Seq(("sign test", Seq(1.0, 0.0, 1.0))))
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

  test("DSv2 commit protocol: speculative duplicate attempt never surfaces; abort keeps prior data") {
    import graft.sources.{SerializableHadoopConf, VdbBatchWrite, VdbCommitMessage}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def row(t: String, v: Array[Double]) =
      InternalRow(UTF8String.fromString(t), new GenericArrayData(v))
    val dir = Files.createTempDirectory("vdbspec").toString
    val conf = new SerializableHadoopConf(new org.apache.hadoop.conf.Configuration())
    val bw = new VdbBatchWrite(dir, 0, 1, Vdb.TypeDouble, false, "jobaaa", conf)
    val factory = bw.createBatchWriterFactory(null) // PhysicalWriteInfo unused
    // partition 0 runs TWICE (speculation): both attempts task-commit
    // their spool files, but the driver only passes attempt 1's message
    val w00 = factory.createWriter(0, 0L)
    w00.write(row("stale attempt", Array(9.0, 9.0)))
    w00.commit()
    val w01 = factory.createWriter(0, 1L)
    w01.write(row("alpha", Array(1.0, 2.0)))
    val m01 = w01.commit()
    val w1 = factory.createWriter(1, 2L)
    w1.write(row("beta", Array(3.0, 4.0)))
    val m1 = w1.commit()
    bw.commit(Array(m01, m1))
    // only .vdb parts (the local FS also spools Hadoop .crc siblings)
    def vdbs() = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".vdb")).sorted.toSeq
    assert(vdbs() == Seq("part-jobaaa-0.vdb", "part-jobaaa-1.vdb")) // no temp dir, no loser
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_temp")))
    val back = spark.read.format("graft.sources.VdbDataSource").load(dir)
      .orderBy("text").as[(String, Seq[Double])].collect().toSeq
    assert(back == Seq(("alpha", Seq(1.0, 2.0)), ("beta", Seq(3.0, 4.0))))
    // a later job that ABORTS leaves the committed data untouched
    val bw2 = new VdbBatchWrite(dir, 0, 1, Vdb.TypeDouble, false, "jobbbb", conf)
    val f2 = bw2.createBatchWriterFactory(null)
    val w2 = f2.createWriter(0, 9L)
    w2.write(row("never lands", Array(7.0)))
    val m2 = w2.commit().asInstanceOf[VdbCommitMessage]
    bw2.abort(Array(m2))
    assert(vdbs() == Seq("part-jobaaa-0.vdb", "part-jobaaa-1.vdb"))
  }
}
