package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Physical-plan traversal that sees through AQE: `collect` on an
  * adaptively-executed plan stops at leaf QueryStageExec wrappers
  * (result/shuffle/broadcast stages), hiding everything they executed —
  * this walker recurses into their `plan` members (and reused
  * exchanges), so audits observe the REAL operator tree. */
object PlanWalk {
  def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case r: ReusedExchangeExec => allNodes(r.child)
      case other =>
        other.children.flatMap(allNodes) ++
          other.subqueries.flatMap(allNodes)
    })
}
