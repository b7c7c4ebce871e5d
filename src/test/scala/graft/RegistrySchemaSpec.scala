package graft

import org.apache.spark.sql.types._

/** Registry-wide output-shape guard: the driver's oracle harness hashes
  * results through pandas, which cannot sort/factorize nested cells
  * (array/map/struct become numpy ndarrays → `unhashable type`). Every
  * gate query must therefore emit only atomic columns, and DECIMAL /
  * uncast sums are banned from output schemas (the driver's hash is
  * stricter than value equality — see MEMORY: oracle-bit-exact-patterns).
  * This spec analyzes (not runs) every registry entry, so a regression
  * in output shape breaks `sbt test` before it ever reaches the driver.
  */
class RegistrySchemaSpec extends SparkSpec {

  private def atomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _: DecimalType                            => false
    case _                                         => true
  }

  test("every registry query output schema is atomic (pandas-hashable, no DECIMAL)") {
    val bad = SparkEntry.registry.flatMap { q =>
      val schema = q.fn(spark, sf0001).schema
      schema.fields.collect {
        case f if !atomic(f.dataType) => s"${q.name}.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty, s"non-atomic output columns (driver harness cannot hash these):\n  ${bad.mkString("\n  ")}")
  }

  test("every oracle-gated query has distinct, non-empty column names") {
    val bad = SparkEntry.registry.flatMap { q =>
      val names = q.fn(spark, sf0001).schema.fieldNames.toSeq
      val dups = names.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
      if (dups.nonEmpty || names.exists(_.isEmpty)) Some(s"${q.name}: $names") else None
    }
    assert(bad.isEmpty, s"duplicate/empty column names: ${bad.mkString("; ")}")
  }
}
