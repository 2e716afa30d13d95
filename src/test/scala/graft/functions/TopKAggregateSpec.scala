package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom top-k aggregate's contract: identical answers to the
  * row_number-window formulation (on real data, across partition layouts
  * that force the partial/merge/serialize paths), while planning as an
  * aggregation — no Window, no per-group full sort.
  */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("agrees with the window formulation on real orders, any partitioning") {
    GraftFunctions.register(spark)
    val orders = graft.Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    def viaAgg(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.groupBy(col("o_custkey"))
        .agg(GraftFunctions.topk(
          struct(col("o_totalprice"), col("o_orderkey")), 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("o_custkey"), col("i").cast("long"), col("t.o_orderkey"))
        .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val viaWindow = orders
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), (col("rnk") - 1).cast("long"), col("o_orderkey"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaAgg(orders) == viaWindow)
    // 32 input partitions force real partial buffers + serialize/merge
    assert(viaAgg(orders.repartition(32)) == viaWindow)
  }

  test("SQL path, null skipping, k larger than the group") {
    GraftFunctions.register(spark)
    Seq((1L, Some(5L)), (1L, None), (1L, Some(9L)), (2L, Some(1L)))
      .toDF("g", "v").createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      "SELECT g, graft_topk(v, 3) AS top FROM topk_in GROUP BY g ORDER BY g")
      .collect()
    // nulls skipped; k > group size returns just the group, largest first
    assert(rows(0).getSeq[Long](1) == Seq(9L, 5L))
    assert(rows(1).getSeq[Long](1) == Seq(1L))
  }

  test("type checks: k ≤ 0 and unorderable inputs fail analysis, not runtime") {
    GraftFunctions.register(spark)
    Seq((1L, Map("a" -> 1L))).toDF("g", "m").createOrReplaceTempView("topk_bad")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_topk(m, 3) FROM topk_bad").collect() // maps unorderable
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_topk(g, 0) FROM topk_bad").collect()
    }
  }

  test("plans as an aggregation: no Window operator anywhere") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = graft.analytics.CoreQueries.topkAggregate(spark, dir)
    val windows = graft.operators.PlanWalk.collectPlan(
      df.queryExecution.executedPlan) { case w: WindowExec => w }
    assert(windows.isEmpty, df.queryExecution.executedPlan.toString)
  }

  test("object-hash path never falls back to sort-based on the bench data") {
    // The aggregate's whole scale argument (exchange carries ≤ k rows per
    // group per mapper, nothing sorts a full group) only holds while
    // ObjectHashAggregateExec stays on its hash path; past the session's
    // fallbackThreshold it silently degrades to sort-based aggregation.
    // Execute on the largest checked-in SF and assert the runtime metric —
    // not the plan — reports zero fallen-back tasks.
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val df = graft.analytics.CoreQueries.topkAggregate(spark, "/root/testdata/sf0.01")
    df.collect()
    val aggs = graft.operators.PlanWalk.collectPlan(
      df.queryExecution.executedPlan) { case o: ObjectHashAggregateExec => o }
    assert(aggs.nonEmpty, df.queryExecution.executedPlan.toString)
    aggs.foreach { agg =>
      val fallback = agg.metrics.collect {
        case (name, m) if name.toLowerCase.contains("fallback") ||
          name.toLowerCase.contains("fallbacked") => m.value
      }
      assert(fallback.nonEmpty, s"no fallback metric on $agg: ${agg.metrics.keys}")
      assert(fallback.forall(_ == 0L),
        s"sort-based fallback engaged: ${agg.metrics}")
    }
  }
}
