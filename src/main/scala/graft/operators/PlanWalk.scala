package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared physical-plan traversal that descends through the adaptive-
  * execution wrappers — `AdaptiveSparkPlanExec` and `QueryStageExec` have
  * empty `children`, so a naive `plan.collect` on an AQE plan silently sees
  * nothing below them.
  */
object PlanWalk {

  def descend(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case other => other.children
  }

  def collectPlan[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    pf.lift(p).toSeq ++ descend(p).flatMap(collectPlan(_)(pf))

  /** Execute the frame's OWN QueryExecution (an API action like `count()`
    * builds a derived plan and leaves this one untouched — AQE would never
    * finalize), then return the finalized physical plan.
    */
  def executedPlanOf(df: DataFrame): SparkPlan = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan
  }
}
