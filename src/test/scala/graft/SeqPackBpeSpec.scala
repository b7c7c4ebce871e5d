package graft

import org.apache.spark.sql.functions._

/** Packed-length invariants for the BPE-id sequence packer
  * (`q_seq_pack_bpe`) — the properties a pretraining loader relies on,
  * checked structurally rather than against one fixture answer:
  * full blocks everywhere except each shard's tail, contiguous block
  * ids, and conservation of tokens and id mass against the independent
  * `q_bpe_encode` pass.
  */
class SeqPackBpeSpec extends SparkSpec {

  private def packed() =
    SparkEntry.queries("q_seq_pack_bpe")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

  test("every block except each shard's last holds exactly CtxLen tokens") {
    val byLang = packed().groupBy(_._1)
    assert(byLang.nonEmpty)
    for ((lang, rows) <- byLang) {
      val sorted = rows.sortBy(_._2)
      val maxBin = sorted.last._2
      // contiguity: bins are exactly 0..maxBin, no gaps or repeats
      assert(sorted.map(_._2).toSeq == (0L to maxBin),
        s"$lang: block ids must be contiguous from 0")
      val (full, tail) = sorted.partition(_._2 < maxBin)
      assert(full.forall(_._3 == 256L),
        s"$lang: a non-tail block is not CtxLen tokens: " +
          full.filter(_._3 != 256L).mkString(","))
      assert(tail.head._3 >= 1L && tail.head._3 <= 256L,
        s"$lang: tail block size out of range: ${tail.head._3}")
    }
  }

  test("boundary bookkeeping: doc ranges are sane and chain across blocks") {
    for ((lang, rows) <- packed().groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.forall(r => r._4 >= 1 && r._5 <= r._6),
        s"$lang: n_docs >= 1 and first_doc <= last_doc must hold")
      // the shard stream is doc_id-ordered: block k's last doc is <=
      // block k+1's first doc (equal exactly when a doc spans the cut)
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._6 <= b._5,
          s"$lang: doc order broken across blocks ${a._2}->${b._2}")
      }
    }
  }

  test("token and id mass are conserved against the q_bpe_encode pass") {
    val p = packed()
    val enc = SparkEntry.queries("q_bpe_encode")(spark, sf0001)
      .agg(sum("n_tok").cast("long"), sum("id_sum").cast("long"))
      .collect()(0)
    assert(p.map(_._3).sum == enc.getLong(0),
      "packed token total must equal the encode pass's token total")
    assert(p.map(_._7).sum == enc.getLong(1),
      "packed id mass must equal the encode pass's id mass")
  }
}
