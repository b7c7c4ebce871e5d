package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.CosineDistance

/** Optimizer rule: canonicalize `CosineDistance(literal, column)` to
  * `CosineDistance(column, literal)`. Cosine is symmetric, but the
  * kernel's plan-time constant hoist (precomputed primitive array +
  * ‖b‖, a third of the per-row FLOPs — [[CosineDistance.constRight]])
  * only engages when the FOLDABLE side is on the right. A user writing
  * `graft_cosine_distance(array(...), e.embedding)` in SQL would
  * silently run the slow generic loop on every row of the scan; after
  * this rule both argument orders compile to the hoisted kernel.
  *
  * The swap only fires when exactly one side is foldable (both-foldable
  * folds to a constant upstream; neither-foldable has no hoist to
  * enable), so it cannot oscillate and is idempotent — the fixed-point
  * condition batch-rules need.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`) — the
  * deployment-wide `spark.sql.extensions` path, the idiomatic way to
  * extend Catalyst without forking it.
  */
object CosineArgSwapRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineDistance(l, r, asDist) if l.foldable && !r.foldable =>
        CosineDistance(r, l, asDist)
    }
}
