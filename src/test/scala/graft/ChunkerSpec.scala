package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Chunker.chunkText

/** Property + golden tests for the chunker's reference semantics
  * (`load-texts.c:37-105`; edge corpus from FIXTURES.md §3.5).
  * Properties run over seeded random corpora (deterministic).
  */
class ChunkerSpec extends AnyFunSuite {

  private val L = 100

  test("short text -> single whole chunk") {
    assert(chunkText("hello", L) == Seq("hello"))
    assert(chunkText("", L) == Seq(""))
  }

  test("text of exactly requested length -> single chunk minus final char") {
    val t = "x" * L
    assert(chunkText(t, L) == Seq(t.dropRight(1)))
  }

  test("no-space text -> hard cuts at exactly L chars") {
    val t = "x" * 300
    assert(chunkText(t, L) == Seq("x" * 100, "x" * 100, "x" * 99))
  }

  test("normal text: chunks end at word boundaries, next begins at the space") {
    val t = ("word " * 50).trim + "!" // 251 chars
    val cs = chunkText(t, L)
    assert(cs.forall(_.length <= L))
    cs.drop(1).foreach(c => assert(c.startsWith(" ")))
  }

  test("property: concat(chunks) reconstructs text[0, len-1) for long texts") {
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma-delta", "x", "spark", "engine")
    (1 to 200).foreach { _ =>
      val t = Seq.fill(20 + rnd.nextInt(100))(words(rnd.nextInt(words.size))).mkString(" ")
      if (t.length >= L)
        assert(chunkText(t, L).mkString == t.substring(0, t.length - 1), s"text=$t")
    }
  }

  test("native Generator == UDF+posexplode on fixture documents") {
    val spark = SparkSpec.spark
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val viaGen = graft.operators.Chunker.chunk(docs, "text", L)
    val viaUdf = graft.operators.Chunker.chunkViaUdf(docs, "text", L)
    assert(viaGen.count() == viaUdf.count())
    assert(viaGen.exceptAll(viaUdf).isEmpty && viaUdf.exceptAll(viaGen).isEmpty)
  }

  test("property: every chunk at most L chars, incl. hard-cut corpora") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val t = Array.fill(50 + rnd.nextInt(500))(
        if (rnd.nextInt(10) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar).mkString
      assert(chunkText(t, L).forall(_.length <= L), s"text=$t")
    }
  }
}
