package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Twenty-fourth batch: referential-integrity audit over the
  * relational tables — the pre-join data-quality gate (orphan rates,
  * fan-out stats) that decides whether a join is safe to run and how
  * it will skew, before a byte shuffles.
  */
object CurationQueries24 {

  /** FK AUDIT — for each declared child->parent edge (lineitem->
    * orders, orders->customer, customer->nation): child rows, distinct
    * child keys, ORPHAN rows (child keys absent from the parent — the
    * rows an inner join silently drops), max and mean fan-out over
    * matched parents (the skew number that prices the join). SCALE:
    * per edge, one key-distinct aggregate on each side + one anti-join
    * count; parents of the outer edges are broadcast-sized. The audit
    * is the cheap pass that catches a truncated dimension load before
    * a 100-TB fact join multiplies the damage.
    */
  val fkAudit: QueryDef = QueryDef.sql(
    "q_fk_audit",
    """WITH e1 AS (
      |  SELECT 'lineitem->orders' AS rel, count(*) AS n_child,
      |         count(DISTINCT l.l_orderkey) AS n_keys,
      |         count(*) FILTER (WHERE o.o_orderkey IS NULL) AS n_orphans
      |  FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey),
      |f1 AS (SELECT max(c) AS mx, sum(c) AS sc, count(*) AS np FROM (
      |       SELECT count(*) AS c FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |       GROUP BY l.l_orderkey) g),
      |e2 AS (
      |  SELECT 'orders->customer' AS rel, count(*) AS n_child,
      |         count(DISTINCT o.o_custkey) AS n_keys,
      |         count(*) FILTER (WHERE c.c_custkey IS NULL) AS n_orphans
      |  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey),
      |f2 AS (SELECT max(c) AS mx, sum(c) AS sc, count(*) AS np FROM (
      |       SELECT count(*) AS c FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |       GROUP BY o.o_custkey) g),
      |e3 AS (
      |  SELECT 'customer->nation' AS rel, count(*) AS n_child,
      |         count(DISTINCT c.c_nationkey) AS n_keys,
      |         count(*) FILTER (WHERE n.n_nationkey IS NULL) AS n_orphans
      |  FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey),
      |f3 AS (SELECT max(c) AS mx, sum(c) AS sc, count(*) AS np FROM (
      |       SELECT count(*) AS c FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      |       GROUP BY c.c_nationkey) g)
      |SELECT rel, CAST(n_child AS BIGINT) AS n_child,
      |       CAST(n_keys AS BIGINT) AS n_keys,
      |       CAST(n_orphans AS BIGINT) AS n_orphans,
      |       CAST(mx AS BIGINT) AS max_fanout,
      |       CAST(sc * 100 // np AS BIGINT) AS avg_fanout_x100
      |FROM (SELECT * FROM e1, f1 UNION ALL
      |      SELECT * FROM e2, f2 UNION ALL
      |      SELECT * FROM e3, f3) u""".stripMargin) { (spark, dir) =>
    // ROUND-16 SHAPE (guide §2.4): ONE left join per edge feeds the
    // whole audit — per-key counts first (a key's left-join rows are
    // its inner-join fan-out when matched, its orphan rows when not;
    // the two are never mixed because equal keys match equal parent
    // sets), then a 1-row fold. The first cut ran TWO joins per edge
    // (orphan pass + fan-out pass), each re-scanning both sides — 24
    // scans / 42 exchanges across the 3-edge union.
    def edge(rel: String, child: DataFrame, ck: String,
             parent: DataFrame, pk: String): DataFrame = {
      val j = child.join(parent, child(ck) === parent(pk), "left")
      val g = j.groupBy(child(ck).as("k"))
        .agg(count(lit(1)).as("n"), count(when(parent(pk).isNull, 1)).as("n_null"))
      // coalesce(. , 0): on an EMPTY child table sum() over zero groups
      // is NULL where the oracle's keyless count(*) is 0 — the fold must
      // preserve the pre-round-16 empty-table contract (round-16 ADVICE)
      g.agg(coalesce(sum(col("n")), lit(0L)).as("n_child"),
          count(col("k")).as("n_keys"),
          coalesce(sum(col("n_null")), lit(0L)).as("n_orphans"),
          max(when(col("n_null") === 0, col("n"))).as("mx"),
          sum(when(col("n_null") === 0, col("n"))).as("sc"),
          count(when(col("n_null") === 0, 1)).as("np"))
        .select(lit(rel).as("rel"), col("n_child"), col("n_keys"),
          col("n_orphans"), col("mx").as("max_fanout"),
          expr("sc * 100 DIV np").as("avg_fanout_x100"))
    }
    def t(n: String): DataFrame = Tables(spark, dir, n)
    edge("lineitem->orders", t("lineitem"), "l_orderkey", t("orders"), "o_orderkey")
      .unionByName(edge("orders->customer", t("orders"), "o_custkey",
        t("customer"), "c_custkey"))
      .unionByName(edge("customer->nation", t("customer"), "c_nationkey",
        t("nation"), "n_nationkey"))
  }

  val all: Seq[QueryDef] = Seq(fkAudit)
}
