package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions.polyHashSql
import graft.functions.VectorFunctions.cosDistSql
import graft.operators.Prompt
import graft.pipelines.{IndexBuild, MockEmbedder, Rag}

/** The two reference pipelines end-to-end, oracle-checked:
  *
  * - `q_index_build`: read → chunk → (mock-)embed, the batch half
  *   (`build-vector-db-from-server.c:9-78`). The deterministic mock
  *   embedder is pure integer→double algebra, so even the embedding
  *   values are replayed exactly by DuckDB.
  * - `q_rag_e2e`: the query half (`multirag.c:394-456`) on top of that
  *   index: embed query → brute-force cosine top-3 → gather → prompt.
  */
object PipelineQueries {

  private val L = TextQueries.ChunkLen
  private val UserInput = "retrieval augmented generation query"

  /** he/emb CTEs: chunk hashes and mock-embedding vectors. */
  private val EmbCte = {
    val dims = (0 until MockEmbedder.dim).map(d => MockEmbedder.dimSql("h", d)).mkString(", ")
    s"""he AS (SELECT doc_id, chunk_idx, chunk, ${polyHashSql("chunk")} AS h FROM chunks),
       |emb AS (SELECT doc_id, chunk_idx, chunk, [$dims] AS v FROM he)""".stripMargin
  }

  val indexBuild: QueryDef = QueryDef.sql(
    "q_index_build", {
      val outDims = (0 until MockEmbedder.dim).map(d => s"v[${d + 1}] AS e$d").mkString(", ")
      s"""WITH RECURSIVE ${TextQueries.chunkCte(L)},
         |$EmbCte
         |SELECT doc_id, chunk_idx, $outDims FROM emb""".stripMargin
    }) { (spark, dir) =>
    val idx = IndexBuild.build(Tables(spark, dir, "documents").select("doc_id", "text"),
      "doc_id", "text", L, MockEmbedder)
    idx.select(Seq(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx")) ++
      (0 until MockEmbedder.dim).map(d =>
        element_at(col("embedding"), d + 1).as(s"e$d")): _*)
  }

  val ragE2e: QueryDef = QueryDef.sql(
    "q_rag_e2e", {
      val qDims = (0 until MockEmbedder.dim)
        .map(d => MockEmbedder.dimSql(polyHashSql(s"'$UserInput'"), d)).mkString(", ")
      val sqlStr: String => String =
        s => "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
      s"""WITH RECURSIVE ${TextQueries.chunkCte(L)},
         |$EmbCte,
         |q AS (SELECT [$qDims] AS qv),
         |ranked AS (
         |  SELECT chunk, doc_id * 1000 + chunk_idx AS chunk_id,
         |         row_number() OVER (ORDER BY ${cosDistSql("v", "qv")}, doc_id * 1000 + chunk_idx) AS rank
         |  FROM emb, q
         |  QUALIFY rank <= 3)
         |SELECT ${sqlStr(Prompt.SystemMsgStart)}
         |       || string_agg('Context ' || CAST(rank AS VARCHAR) || ':' || chr(10) || chunk || ' ' || chr(10) || ' ', '' ORDER BY rank)
         |       || ${sqlStr(Prompt.conversationWithUserTurn("", UserInput))} AS prompt
         |FROM ranked""".stripMargin
    }) { (spark, dir) =>
    val index = IndexBuild.build(Tables(spark, dir, "documents").select("doc_id", "text"),
      "doc_id", "text", L, MockEmbedder)
      .withColumn("chunk_id", col("doc_id") * 1000 + col("chunk_idx"))
    Rag.answer(spark, index, "chunk_id", "chunk", "embedding", MockEmbedder,
      UserInput, "", 3)
  }

  val all: Seq[QueryDef] = Seq(indexBuild, ragE2e)
}
