package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-boundary text chunker — the reference's table-generating function
  * `cut_texts_in_subtexts` (`load-texts.c:37-105`), re-expressed as a pure
  * Scala function exposed to Catalyst through a UDF + `posexplode`.
  *
  * Exact reference semantics, all edge rules preserved:
  *  - text shorter than `requestedLength` → a single chunk = whole text
  *    (`load-texts.c:48-57`);
  *  - otherwise repeatedly cut at `prev + requestedLength`, scanning
  *    backward to the last space strictly after `prev`; the next chunk
  *    starts AT that space (`load-texts.c:59-84`);
  *  - window with no space → hard cut at exactly `requestedLength` chars
  *    (`load-texts.c:65-68`);
  *  - the tail chunk spans [prev, len-1): the final character of the text
  *    is always dropped (`load-texts.c:87-101`).
  *
  * Deviation (documented): the reference is byte-oriented; we operate on
  * UTF-16 code units, identical for ASCII corpora like the fixtures.
  *
  * Scale note: chunking is embarrassingly parallel (one row in, N out, no
  * shuffle); at 100 TB it pipelines inside the same stage as the scan.
  */
object Chunker {

  /** Pure chunking function, 1:1 with the C control flow. */
  def chunkText(text: String, requestedLength: Int): Seq[String] = {
    require(requestedLength > 0, "requestedLength must be positive")
    val len = text.length
    if (len < requestedLength) return Seq(text)
    val out = Seq.newBuilder[String]
    var prev = 0
    var pos = requestedLength
    while (pos < len - 1) {
      while (pos > prev && text.charAt(pos) != ' ') pos -= 1
      if (pos == prev) pos += requestedLength // no space in window: hard cut
      out += text.substring(prev, pos)
      prev = pos
      pos += requestedLength
    }
    if (prev < len && pos >= len - 1)
      out += text.substring(prev, len - 1) // reference drops the final char
    out.result()
  }

  /** DataFrame form: explode `textCol` into (chunk_idx, chunk) rows,
    * keeping all other columns. 1 row → N rows in document order.
    * Uses the native [[ChunkGenerator]] (rows emitted directly, no UDF
    * boxing / posexplode round trip).
    */
  def chunk(df: DataFrame, textCol: String, requestedLength: Int): DataFrame =
    df.select(col("*"),
      org.apache.spark.sql.GraftShim.column(
        ChunkGenerator(org.apache.spark.sql.GraftShim.expression(col(textCol)), requestedLength))
        .as(Seq("chunk_idx", "chunk")))
      .drop(textCol)

  /** UDF + posexplode formulation, kept as the cross-check for the
    * native generator.
    */
  def chunkViaUdf(df: DataFrame, textCol: String, requestedLength: Int): DataFrame = {
    val chunkUdf = udf((t: String) => chunkText(t, requestedLength))
    df.select(col("*"), posexplode(chunkUdf(col(textCol))).as(Seq("chunk_idx", "chunk")))
      .drop(textCol)
  }
}
