package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the reference chunker: the edge rules
  * (`load-texts.c:37-105`) imply three machine-checkable invariants
  * that must hold for ANY text, not just the fixtures' — the oracle's
  * recursive-CTE replay checks equality per fixture doc; these pin the
  * CONTRACT itself under arbitrary inputs.
  */
class ChunkerPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // texts with realistic space density plus degenerate runs
  private val text: Gen[String] = Gen.frequency(
    4 -> Gen.listOf(Gen.frequency(5 -> Gen.alphaNumChar, 1 -> Gen.const(' ')))
      .map(_.mkString),
    1 -> Gen.listOf(Gen.alphaNumChar).map(_.mkString), // no spaces: hard cuts
    1 -> Gen.chooseNum(0, 30).map(" " * _)) // all spaces
  private val cases: Gen[(String, Int)] =
    for { t <- text; l <- Gen.chooseNum(3, 12) } yield (t, l)

  test("chunks concatenate to the text minus exactly the dropped final char") {
    check(forAll(cases) { case (t, l) =>
      val joined = graft.operators.Chunker.chunkText(t, l).mkString
      val expect = if (t.length < l) t else t.dropRight(1)
      Prop(joined == expect) :| s"t='$t' l=$l joined='$joined'"
    })
  }

  test("every chunk respects the requested length bound") {
    check(forAll(cases) { case (t, l) =>
      val cs = graft.operators.Chunker.chunkText(t, l)
      Prop(cs.forall(c => c.length <= math.max(l, t.length.min(l)))) :|
        s"t='$t' l=$l lens=${cs.map(_.length)}"
    })
  }

  test("only the tail chunk may be empty; counts cover the text") {
    check(forAll(cases) { case (t, l) =>
      val cs = graft.operators.Chunker.chunkText(t, l)
      Prop(cs.nonEmpty && cs.dropRight(1).forall(_.nonEmpty)) :| s"t='$t' l=$l"
    })
  }
}
