package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Twenty-eighth batch: embedding-space anisotropy — the collapse
  * detector for embedding quality.
  */
object CurationQueries28 {

  private val S52 = "4503599627370496.0"
  private val S52d = 4503599627370496.0
  private val S45 = "35184372088832.0"
  private val S45d = 35184372088832.0

  /** EMBED ANISOTROPY — ||E[v]||^2 against E[||v||^2], in Q45 fixed
    * point and basis points: the share of the space's energy sitting
    * in ONE common direction. Healthy embedding spaces score low;
    * an anisotropy ratio creeping toward 10000 bp means vectors share
    * a dominant component (the "embedding collapse" failure mode) and
    * cosine similarity degenerates toward a constant — the upstream
    * cause of ANN recall cliffs that `q_knn_recall` only measures
    * downstream. Integer discipline: per-dim sums on the 2^52 grid
    * (exact), per-dim mean-square and norm terms floor-quantized to
    * Q45 BEFORE the 64-term sums, and the per-dim norm energy is
    * normalized by n PER DIM before summing — keeping every integer
    * far from 2^63 at ANY corpus size (a global Q45 energy sum would
    * overflow a long near 10^7 vectors; the oracle's HUGEINT would
    * not, and the engines would silently diverge). The per-dim sums
    * themselves accumulate as DECIMAL(38,0) on the Spark side: DuckDB
    * sums BIGINT into HUGEINT (128-bit, exact) while Spark's
    * sum(long) wraps silently at 2^63 — which a Q52-scaled term
    * reaches near 10^6-10^7 vectors. Decimal sums are exact to 38
    * digits (~2^126) in Spark, so both engines stay exact at any
    * realistic corpus size and every downstream value is unchanged.
    * SCALE: one (dim x stats) reduce — 64 groups,
    * corpus-size-invariant algebra after.
    */
  val embedAnisotropy: QueryDef = QueryDef.sql(
    "q_embed_anisotropy",
    s"""WITH ed AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       |            FROM embeddings, UNNEST(range(1, 65)) t(i)),
       |per AS (SELECT i, count(*) AS n,
       |               sum(CAST(floor(x * $S52) AS BIGINT)) AS s,
       |               sum(CAST(floor(x * x * $S45) AS BIGINT)) AS sx2
       |        FROM ed GROUP BY i),
       |m AS (SELECT max(n) AS n,
       |             sum(CAST(floor((CAST(s AS DOUBLE) / $S52 / n) *
       |                            (CAST(s AS DOUBLE) / $S52 / n) * $S45) AS BIGINT)) AS a,
       |             sum(sx2 // n) AS b
       |      FROM per)
       |SELECT CAST(n AS BIGINT) AS n_vecs,
       |       CAST(a AS BIGINT) AS mean_norm2_q45,
       |       CAST(b AS BIGINT) AS avg_norm2_q45,
       |       CAST(a * 10000 // greatest(b, 1) AS BIGINT) AS anisotropy_bp
       |FROM m""".stripMargin) { (spark, dir) =>
    val per = Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("i0", "x0")))
      .select((col("i0") + 1).cast("long").as("i"), col("x0").cast("double").as("x"))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        // decimal(38,0) accumulators: exact to ~2^126 like DuckDB's
        // HUGEINT sum, where sum(long) would wrap near 10^6-10^7 vectors
        sum(floor(col("x") * S52d).cast("decimal(38,0)")).as("s"),
        sum(floor(col("x") * col("x") * S45d).cast("decimal(38,0)")).as("sx2"))
    per.agg(max("n").as("n"),
        sum(floor((col("s").cast("double") / S52d / col("n")) *
          (col("s").cast("double") / S52d / col("n")) * S45d).cast("long")).as("a"),
        sum(expr("sx2 DIV n")).as("b"))
      .select(col("n").as("n_vecs"),
        col("a").as("mean_norm2_q45"),
        col("b").as("avg_norm2_q45"),
        expr("a * 10000 DIV greatest(b, 1)").as("anisotropy_bp"))
  }

  val all: Seq[QueryDef] = Seq(embedAnisotropy)
}
