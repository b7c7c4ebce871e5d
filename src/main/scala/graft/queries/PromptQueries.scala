package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions.cosDistSql
import graft.operators.{Prompt, TopK}

/** RAG retrieval + prompt assembly (T1+T2+A1, `multirag.c:52-152`):
  * top-3 nearest embeddings to the query vector, gather their document
  * text by id (the reference's positional gather, `multirag.c:115-119`,
  * here an explicit broadcast join), fold into the Llama-3 instruct
  * prompt in ascending-distance order.
  */
object PromptQueries {

  private val UserInput = "What does the spark engine do?"

  // SQL-escaped prompt constants for the DuckDB oracle (newlines as chr(10)).
  private def sqlStr(s: String): String =
    "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

  val ragPrompt: QueryDef = QueryDef.sql(
    "q_rag_prompt",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |topk AS (
       |  SELECT vec_id,
       |         row_number() OVER (ORDER BY ${cosDistSql("v", "qv")}, vec_id) AS rank
       |  FROM e, q
       |  QUALIFY rank <= 3
       |),
       |ctx AS (SELECT t.rank, d.text FROM topk t JOIN documents d ON d.doc_id = t.vec_id)
       |SELECT ${sqlStr(Prompt.SystemMsgStart)}
       |       || string_agg('Context ' || CAST(rank AS VARCHAR) || ':' || chr(10) || text || ' ' || chr(10) || ' ', '' ORDER BY rank)
       |       || ${sqlStr(Prompt.conversationWithUserTurn("", UserInput))} AS prompt
       |FROM ctx""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    // ranks become positions in (dist, vec_id) order inside the assembly
    // fold — no window over the 3-row top-k frame
    val topk = TopK.nearest(emb, "embedding", "vec_id", q, 3)
      .select("vec_id", "dist")
    // gather text for the k winners: broadcast the tiny top-k side
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val ctx = docs.join(broadcast(topk), topk("vec_id") === docs("doc_id"))
    Prompt.assembleByOrder(ctx, Seq(col("dist"), col("vec_id")), "text", "", UserInput)
  }

  val all: Seq[QueryDef] = Seq(ragPrompt)
}
