package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The chunker as a native Catalyst `Generator` (the reference's
  * table-generating function shape, SURVEY §2 R2): one text row in,
  * (chunk_idx, chunk) rows out, emitted directly as InternalRows —
  * no UDF boxing, no intermediate array allocation, no separate
  * posexplode step. Exact `cut_texts_in_subtexts` semantics via
  * [[Chunker.chunkText]].
  */
case class ChunkGenerator(child: Expression, requestedLength: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val chunks = Chunker.chunkText(t.toString, requestedLength)
      var i = -1
      chunks.map { c => i += 1; InternalRow(i, UTF8String.fromString(c)) }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
