package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — turns near-dup
  * PAIRS into dedup GROUPS (component id = min doc id in the group, i.e.
  * the keeper). The last stage of every dedup pipeline: pairs only tell
  * you who matches whom; retention needs one representative per group.
  *
  * Algorithm: hash-to-min label propagation — every node repeatedly
  * adopts the smallest label in its neighborhood (including its own).
  * Each iteration is one join + one aggregation (all key-partitioned
  * shuffles); the label space only shrinks, so convergence is monotone
  * and needs O(diameter) rounds — near-dup components are tiny cliques,
  * so a handful. This is the standard scalable CC for exactly this shape
  * (billions of nodes, small components); a giant-diameter graph would
  * want the large-star/small-star variant instead.
  */
object ConnectedComponents {

  /** pairs(aCol, bCol) → (id, component) for every endpoint, where
    * component = min id reachable. Deterministic.
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 20): DataFrame = {
    // symmetric edge list + self-loops
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    // localCheckpoint (not persist!) each round: an iterative join loop
    // grows the LOGICAL plan exponentially (each round references the
    // previous frame several times), and plan-string construction alone
    // OOMs after ~8 rounds; checkpointing truncates lineage to a leaf.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var prevSum = labels.agg(sum("component")).head().getLong(0)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node's new label: min over own label and neighbors' labels
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("component"))
      val propagated = labels.unionAll(neighborLabels)
        .groupBy("id").agg(min(col("component")).as("component"))
        .persist() // read twice below (main side + parents side)
      // pointer jumping: adopt the label OF the label node — doubles the
      // propagation distance per round, so convergence is O(log diameter)
      // instead of O(diameter) (a plain neighbor walk stalls on chains)
      val parents = propagated
        .select(col("id").as("component"), col("component").as("parent"))
      val next = propagated.join(parents, "component")
        .select(col("id"), least(col("component"), col("parent")).as("component"))
        .localCheckpoint(true) // materializes + truncates lineage
      // labels only decrease, so an equal checksum is a join-free
      // convergence signal
      val nextSum = next.agg(sum("component")).head().getLong(0)
      propagated.unpersist()
      labels = next
      converged = prevSum == nextSum
      prevSum = nextSum
      iter += 1
    }
    edges.unpersist()
    labels
  }
}
