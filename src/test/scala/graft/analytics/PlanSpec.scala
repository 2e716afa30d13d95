package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike

import graft.SparkSpec
import graft.operators.PlanWalk

/** Plan-shape regressions: the scale properties §"Scale design notes" of
  * the README claims — filter pushdown to the scan, narrow ReadSchema,
  * broadcast dims, top-k without a global sort — asserted on the actual
  * physical plans so a refactor can't silently lose them.
  */
class PlanSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  def scans(df: DataFrame): Seq[FileSourceScanExec] =
    PlanWalk.collectPlan(df.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }

  test("q01: shipdate filter is pushed to the parquet scan; schema is pruned") {
    val df = CoreQueries.pricingSummary(spark, dir)
    val scan = scans(df).head
    assert(scan.metadata("PushedFilters").contains("LessThan(l_shipdate"),
      scan.metadata("PushedFilters"))
    // 11-column table, 6-column read
    assert(scan.schema.fieldNames.length == 6, scan.schema.fieldNames.mkString(","))
    assert(!scan.schema.fieldNames.contains("l_partkey"))
  }

  test("q16: both dimension joins broadcast (no shuffle join for dims)") {
    val df = CoreQueries.nationRevenue(spark, dir)
    val broadcasts = PlanWalk.collectPlan(df.queryExecution.executedPlan) {
      case b: BroadcastExchangeLike => b
    }
    assert(broadcasts.size == 2, df.queryExecution.executedPlan.toString)
  }

  test("q03: global top-k plans as TakeOrderedAndProject, not sort-all") {
    val df = CoreQueries.topOrders(spark, dir)
    val topk = PlanWalk.collectPlan(df.queryExecution.executedPlan) {
      case t: TakeOrderedAndProjectExec => t
    }
    assert(topk.nonEmpty, df.queryExecution.executedPlan.toString)
  }

  test("q19: JSON parse sits above the sort (no double execution via sampling)") {
    val df = CoreQueries.jsonExtract(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    // the Sort's child must not contain the json expression
    val sortIdx = plan.indexOf("Sort")
    val jsonIdx = plan.indexOf("get_json_object")
    assert(sortIdx >= 0 && jsonIdx >= 0 && jsonIdx < sortIdx, plan)
  }
}
