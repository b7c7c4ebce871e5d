package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Brute-force exact k-NN: the reference's core query operator
  * (`create_closest_distances`, `vector-db.c:148-177`): distance of the
  * query vector against every row, sort ascending, take k.
  *
  * Spark-first shape: the query vector is a *literal* (broadcast to every
  * task for free), the distance is a scalar expression, and
  * `orderBy(...).limit(k)` plans `TakeOrderedAndProject` — a per-partition
  * bounded priority queue merged on the driver, no global shuffle. That is
  * strictly better than the reference's full O(N log N) qsort and scales to
  * any partition count.
  *
  * Deviations from the reference, both deliberate:
  *  - ties broken deterministically on `idCol` (C qsort is unstable,
  *    `vector-db.c:20-29`);
  *  - n < k returns n rows instead of hard-exiting (`vector-db.c:160-163`).
  */
object TopK {

  /** Literal column for a query vector. */
  def vecLit(q: Seq[Double]): Column = array(q.map(lit): _*)

  /** Nearest k rows of `db` to query vector `q` by cosine distance.
    * Output: all columns of `db` plus `dist`.
    */
  def nearest(db: DataFrame, embCol: String, idCol: String,
              q: Seq[Double], k: Int): DataFrame =
    db.withColumn("dist", cosineDistance(col(embCol), vecLit(q)))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
}
