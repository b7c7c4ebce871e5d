package graft

import org.apache.spark.sql.DataFrame

/** The durability escape hatch for lineage-severed stages (round-13
  * verdict item 3 — the PLANS.md round-12 ledger rule, now executable).
  *
  * The iterative/contraction pipelines sever lineage with
  * `localCheckpoint`: materialized to executor-local blocks, fastest,
  * but NON-REPLICATED — losing an executor kills the query. That is the
  * right default on dedicated clusters (a retry re-runs the stage). On
  * PREEMPTIBLE clusters the same stage must persist to the reliable
  * checkpoint store instead: set
  *
  *   spark.graft.reliableCheckpoint=true
  *   sparkContext.setCheckpointDir(<fault-tolerant path>)
  *
  * and every [[stage]] call writes a reliable `.checkpoint()` — SAME
  * plan shape (both modes re-enter the plan as a LogicalRDD scan, so
  * AQE still sees exact materialized sizes at the downstream joins),
  * one config line, no query rewrite. DurabilitySpec pins both claims:
  * bit-equal output and node-identical physical plans across modes.
  *
  * COVERAGE (round 17, stated explicitly): only the long-lived
  * iterative/contraction stages route through [[stage]]. REGISTRY
  * QUERIES' in-query materializations call `localCheckpoint()` raw,
  * DELIBERATELY, per the round-12 ledger rule: a bench/oracle query is
  * retried from scratch on failure, so replicating its intermediates
  * buys nothing and costs the checkpoint write every run — each such
  * site cites its ledger class at the call. Library WRITE-path
  * operators that checkpoint internally (`CorpusMerge.merge`,
  * `IvfIndex.publishVersion`/`appendVectors`) document the same
  * retry-from-scratch assumption in their own contracts.
  */
object Durability {

  val Flag = "spark.graft.reliableCheckpoint"

  /** Materialize `df` and sever lineage, honoring the durability flag. */
  def stage(df: DataFrame): DataFrame = {
    val reliable =
      df.sparkSession.conf.getOption(Flag).exists(_.toBoolean)
    if (reliable) {
      require(df.sparkSession.sparkContext.getCheckpointDir.nonEmpty,
        s"$Flag=true needs sparkContext.setCheckpointDir(<fault-tolerant path>) " +
          "— the reliable store the preemptible-cluster mode exists to use")
      df.checkpoint()
    } else df.localCheckpoint()
  }
}
