package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.tokens

/** Sequence packing over LEARNED token ids — the composition the
  * round-10 verdict asked for (item 7): `q_seq_pack` packs whitespace
  * token counts, `q_bpe_encode` produces learned BPE ids; this packs
  * the BPE-id stream into fixed CONTEXT-LENGTH blocks with
  * document-boundary bookkeeping — the actual shape pretraining data
  * ships in (cf. the reference's word-boundary chunker as the
  * proto-packer, load-texts.c:37-105: fixed-size windows over a
  * concatenated token stream, documents crossing window edges).
  */
object TextStatsQueries2 {

  /** Fixed context length (BPE tokens per packed block); shared with
    * the streaming packer ([[graft.streaming.PackerStreams]]).
    */
  private[graft] val CtxLen = 256

  /** BPE-ID SEQUENCE PACKING — train the merge table (memoized,
    * [[TextStatsQueries.learnedMergeRows]]), encode the corpus
    * map-side, lay each shard (= lang, the `q_seq_pack` convention)
    * out as one contiguous id stream in deterministic doc_id order,
    * and cut it into [[CtxLen]]-token context blocks. Per block:
    * token count, how many documents contribute (the boundary
    * bookkeeping — n_docs > 1 means a document crosses into this
    * block), the first/last contributing doc, and two id checksums
    * (plain sum + in-block-offset-weighted sum) that pin the EXACT id
    * sequence of the block without array-compare fragility — the
    * `q_bpe_encode` checksum discipline, now per block instead of per
    * document.
    *
    * SCALE: shards pack independently (segmented by lang — no global
    * order). The only doc-ordered work is the per-shard cumulative
    * token count over one row per document (never exploded tokens),
    * computed by [[graft.operators.PrefixSum]] (round 13): a
    * lang-partitioned window put each language's whole doc stream
    * through ONE task — a parallelism ceiling of #languages that the
    * linear slope gates cannot see — where the segmented two-pass scan
    * keeps identical sums at full parallelism. Each token's global
    * position is then doc-start + in-doc offset, computed map-side at
    * explode time. The
    * token→id join broadcasts the tokenizer-sized vocab (the
    * `q_bpe_encode` rationale) so the exploded stream never shuffles
    * for it, and the block aggregate partial-aggregates inside scan
    * partitions into a Θ(blocks) exchange. Invariants (every block
    * except each shard's last holds exactly CtxLen tokens; blocks are
    * contiguous from 0; totals match the encode pass) are
    * property-tested in SeqPackBpeSpec.
    */
  val seqPackBpe: QueryDef = {
    val iters = TextStatsQueries.BpeIters
    QueryDef.sql(
      "q_seq_pack_bpe",
      s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |${TextStatsQueries.bpeRoundCtes(iters)},
         |v AS (SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS id
         |      FROM (SELECT DISTINCT unnest(toks) AS tok FROM t$iters)),
         |enc AS (SELECT d.lang, t.doc_id, t.toks, CAST(len(t.toks) AS BIGINT) AS n_tok
         |        FROM t$iters t JOIN documents d USING (doc_id)
         |        WHERE len(t.toks) >= 1),
         |c AS (SELECT lang, doc_id, toks,
         |             CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |                  - n_tok AS BIGINT) AS cum0
         |      FROM enc),
         |e AS (SELECT lang, doc_id, cum0 + pos - 1 AS gpos, toks[pos] AS tok
         |      FROM c, unnest(range(1, len(toks) + 1)) u(pos)),
         |j AS (SELECT lang, doc_id, gpos, v.id FROM e JOIN v USING (tok))
         |SELECT lang, CAST(gpos // $CtxLen AS BIGINT) AS bin,
         |       CAST(count(*) AS BIGINT) AS n_tok,
         |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(min(doc_id) AS BIGINT) AS first_doc,
         |       CAST(max(doc_id) AS BIGINT) AS last_doc,
         |       CAST(sum(id) AS BIGINT) AS id_sum,
         |       CAST(sum((gpos % $CtxLen + 1) * id) AS BIGINT) AS id_oxw
         |FROM j GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = Tables(spark, dir, "documents")
      val merges = TextStatsQueries.learnedMergeRows(spark, dir, iters)
        .map { case (_, l, r, _, _) => (l, r) }
      val enc = docs.select(col("lang"), col("doc_id"),
        merges.foldLeft(tokens(col("text"))) { case (cc, (l, r)) =>
          graft.functions.HashExpressions.bpeMergeFast(cc, l, r)
        }.as("toks"))
        .filter(size(col("toks")) >= 1)
      // vocab rank: distributed range-sort + per-partition offsets (the
      // q_bpe_encode rationale — no unpartitioned window; round 14
      // unified the idiom on PrefixSum.globalRowNumber, InternalRow
      // end to end)
      val v = graft.operators.PrefixSum.globalRowNumber(
        enc.select(explode(col("toks")).as("tok")).distinct(),
        Seq(col("tok").asc), "id")
      // per-shard doc-scale prefix sum: one row per doc, cum0 = shard
      // stream offset where this doc STARTS. PrefixSum.runningTotal:
      // at sandbox SFs the sum windows IN PLACE (the encode fold runs
      // once, arrays ride the one lang exchange — the pre-round-13
      // plan; a narrow-scan + doc_id join-back here re-ran the whole
      // BPE fold a second time, the round's one structural drift);
      // at corpus scale the segmented two-pass scan runs over the
      // narrow (lang, doc_id, nt) projection — no #languages
      // parallelism ceiling — and re-joins the token arrays on
      // doc_id, so the token mass still crosses exactly ONE exchange.
      val nt = size(col("toks")).cast("long")
      val e = graft.operators.PrefixSum.runningTotal(
          enc.withColumn("nt", nt),
          "lang", Seq("doc_id"), "nt", "cumi")
        .select(col("lang"), col("doc_id"),
          (col("cumi") - col("nt")).as("cum0"), col("toks"))
        .select(col("lang"), col("doc_id"), col("cum0"),
          posexplode(col("toks")).as(Seq("p0", "tok")))
        .select(col("lang"), col("doc_id"),
          (col("cum0") + col("p0")).as("gpos"), col("tok"))
      e.join(broadcast(v), "tok")
        .groupBy(col("lang"), expr(s"gpos DIV $CtxLen").as("bin"))
        .agg(count(lit(1)).as("n_tok"),
          countDistinct(col("doc_id")).as("n_docs"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
          sum("id").cast("long").as("id_sum"),
          sum((col("gpos") % CtxLen + 1) * col("id")).cast("long").as("id_oxw"))
    }
  }

  /** ARTIFACT-BACKED tokenizer encode (round 12) — `q_bpe_encode`
    * split at the deployment seam, completing the artifact-twin family
    * for the MOST-reused artifact in the pipeline. The two artifacts
    * have different SHAPES and deliberately different mechanisms:
    * the merge table is iteration-bounded (the order IS the tokenizer)
    * — driver-side, folded into the scan kernels as literals; the
    * vocabulary is CORPUS-sized (word-level vocab grows with Heaps'
    * law), so it trains distributed, persists as a sharded frame
    * ([[graft.pipelines.ModelArtifacts.saveVocabFrame]]), and re-enters
    * the encode as a broadcast JOIN — exactly `q_bpe_encode`'s tail.
    * A first cut routed the vocab through the streaming projection's
    * driver-literal map and the linear-vocab decade probe priced it at
    * slope 4.98 (2696 s at 1000x) — the join form is the survival
    * path, and the streaming scorer's scaladoc now states its
    * bounded-vocab precondition. Oracle = `q_bpe_encode` SQL verbatim:
    * merges must round-trip IN ORDER and vocab ids exactly.
    */
  val bpeEncodeArtifact: QueryDef = QueryDef.sql(
    "q_bpe_encode_artifact",
    TextStatsQueries.bpeEncode.oracle.get) { (spark, dir) =>
    import spark.implicits._
    val base = s"/tmp/graft_artifacts/${spark.sparkContext.applicationId}/" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")
    val docs = Tables(spark, dir, "documents")
    val merges = TextStatsQueries.learnedMergeRows(spark, dir, TextStatsQueries.BpeIters)
      .map { case (_, l, r, _, _) => (l, r) }
    graft.pipelines.ModelArtifacts.saveMerges(spark, merges, s"$base/merges.parquet")
    val m2 = graft.pipelines.ModelArtifacts.loadMerges(spark, s"$base/merges.parquet")
    def encOf(ms: Seq[(String, String)]) = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("nc"),
      ms.foldLeft(tokens(col("text"))) { case (c, (l, r)) =>
        graft.functions.HashExpressions.bpeMergeFast(c, l, r)
      }.as("toks"))
    // vocab trains DISTRIBUTED (range-sort + per-partition offsets via
    // PrefixSum.globalRowNumber, the q_bpe_encode rationale) and
    // persists sharded — never collected
    graft.pipelines.ModelArtifacts.saveVocabFrame(spark,
      graft.operators.PrefixSum.globalRowNumber(
        encOf(merges).select(explode(col("toks")).as("tok")).distinct(),
        Seq(col("tok").asc), "id"),
      s"$base/vocab.parquet")
    val v = graft.pipelines.ModelArtifacts.loadVocabFrame(spark, s"$base/vocab.parquet")
    val e = encOf(m2).select(col("doc_id"), col("nc"),
        posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("nc"),
        (col("p0") + 1).cast("long").as("pos"), col("tok"))
    // no broadcast hint (unlike the parent, whose RDD-derived vocab has
    // no stats and would SMJ): the loaded parquet carries real size
    // stats, so the planner broadcasts a Heaps-sized vocab and degrades
    // to a shuffled join on a pathological one — the ledger rule
    e.join(v, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("id").cast("long").as("id_sum"),
        sum(col("pos") * col("id")).cast("long").as("id_posw"),
        max("nc").as("nc"))
      .select(col("doc_id"), col("n_tok"), col("id_sum"), col("id_posw"),
        expr("nc * 1048576 DIV n_tok").as("chars_per_tok_q"))
  }

  val all: Seq[QueryDef] = Seq(seqPackBpe, bpeEncodeArtifact)
}
