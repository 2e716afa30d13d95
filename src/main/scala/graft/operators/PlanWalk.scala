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

  /** Free the storage blocks behind a `localCheckpoint()`'d frame once a
    * later round's checkpoint has materialized. `Dataset.localCheckpoint`
    * persists its internal RDD (MEMORY_AND_DISK) and wraps it in a
    * `LogicalRDD`; nothing ever unpersists it, so an iterative loop that
    * checkpoints per round holds one copy of its state per round until
    * the ContextCleaner happens to collect the old RDDs. For VERTEX-sized
    * state that is noise; for EDGE-sized state it is exactly the storage
    * squeeze that starved execution memory and OOM'd the q94 k-core peel
    * on the 100× scaling leg (117M-edge graph, 8g heap — SCALING.md
    * round-10 appendix). Call on the PREVIOUS round's checkpoint right
    * after the next one is materialized; a frame that is not a
    * checkpoint/LogicalRDD is left untouched.
    */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
