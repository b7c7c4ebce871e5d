package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.operators.Chunker

/** Chunking (R2) over the `documents` fixture. The DuckDB oracle replays
  * the exact `cut_texts_in_subtexts` control flow (`load-texts.c:37-105`)
  * as a recursive CTE: backward scan to the last space via
  * reverse+strpos, hard cut when no space in the window, tail chunk
  * dropping the final character, short texts passing through whole.
  */
object TextQueries {

  val ChunkLen = 100

  /** Composable CTE list (use after `WITH RECURSIVE`) defining
    * `chunks(doc_id, chunk_idx, chunk)` with the reference chunker
    * semantics. Shared by the pipeline queries.
    */
  def chunkCte(l: Int): String =
    s"""step AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
       |         CAST(0 AS BIGINT) AS prev, CAST(-1 AS BIGINT) AS chunk_idx,
       |         CAST(NULL AS VARCHAR) AS chunk, false AS fin
       |  FROM documents WHERE length(text) >= $l
       |  UNION ALL
       |  SELECT doc_id, text, len,
       |         CASE WHEN tail THEN len ELSE nxt END AS prev,
       |         chunk_idx + 1,
       |         CASE WHEN tail THEN substr(text, prev + 1, len - 1 - prev)
       |              ELSE substr(text, prev + 1, nxt - prev) END AS chunk,
       |         tail AS fin
       |  FROM (
       |    SELECT doc_id, text, len, prev, chunk_idx,
       |           (prev + $l >= len - 1) AS tail,
       |           CASE WHEN sp > 0 THEN prev + $l - sp + 1 ELSE prev + $l END AS nxt
       |    FROM (
       |      SELECT *, strpos(reverse(substr(text, prev + 2, $l)), ' ') AS sp
       |      FROM step WHERE NOT fin
       |    ) t
       |  ) u
       |),
       |chunks AS (
       |  SELECT doc_id, chunk_idx, chunk FROM step WHERE chunk_idx >= 0
       |  UNION ALL
       |  SELECT doc_id, CAST(0 AS BIGINT), text FROM documents WHERE length(text) < $l)""".stripMargin

  val chunk: QueryDef = QueryDef.sql("q_chunk",
    s"WITH RECURSIVE ${chunkCte(ChunkLen)}\nSELECT doc_id, chunk_idx, chunk FROM chunks") { (spark, dir) =>
    Chunker.chunk(Tables(spark, dir, "documents").select("doc_id", "text"), "text", ChunkLen)
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk"))
  }

  /** The chunker through the SQL TEXT surface: `graft_chunk` registered
    * as a generator (table) function and invoked via LATERAL VIEW — the
    * UDTF face of [[graft.operators.ChunkGenerator]], same oracle as
    * [[chunk]]. With `q_sql_surface`'s scalar functions this completes
    * the SQL-only user's function surface: scalar, aggregate-shaped and
    * table functions all reachable from `spark.sql(...)`.
    */
  val chunkSql: QueryDef = QueryDef.sql("q_chunk_sql",
    s"WITH RECURSIVE ${chunkCte(ChunkLen)}\nSELECT doc_id, chunk_idx, chunk FROM chunks") { (spark, dir) =>
    graft.GraftFunctions.register(spark)
    Tables(spark, dir, "documents").createOrReplaceTempView("g_documents")
    spark.sql(
      s"""SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk
         |FROM g_documents
         |LATERAL VIEW graft_chunk(text, $ChunkLen) c AS chunk_idx, chunk""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(chunk, chunkSql)
}
