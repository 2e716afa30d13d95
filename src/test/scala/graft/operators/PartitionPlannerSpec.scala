package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Equi-depth planner contracts: exact boundaries on a planted value
  * set, conservation (every row lands in exactly one bucket), the
  * duplicate-heavy value that swallows ranks and empties neighbors, the
  * boundary tie rule (equal-to-boundary sorts below), and coarse-width
  * result-invariance (the prefix-sum bucketing is a plan knob, not a
  * semantic one).
  */
class PartitionPlannerSpec extends SparkSpec {
  import spark.implicits._

  test("planted uniform values: 4 buckets of 25 each, boundaries at the " +
    "quartile values") {
    // values 1..100 once each; B=4 → ranks 25/50/75 → bounds 25, 50, 75
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val out = PartitionPlanner.equiDepth(df, col("x"), buckets = 4,
        coarseWidth = 10.0)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, Some(25.0), 25L), (1L, Some(50.0), 25L),
      (2L, Some(75.0), 25L), (3L, None, 25L)))
  }

  test("duplicate-heavy value swallows ranks: neighbors empty, all " +
    "duplicates land together") {
    // 90 extra copies of 5.0 + values 1..10 once: n=100, B=4, ranks
    // 25/50/75 all cross inside the 91-row 5.0 run → all three
    // boundaries are 5.0; bucket 0 = (−∞, 5.0] holds 1..4 plus every
    // 5.0 (95 rows), buckets 1..2 empty, bucket 3 gets the 5 above
    val df = (Seq.fill(90)(5.0) ++ (1 to 10).map(_.toDouble)).toDF("x")
    val out = PartitionPlanner.equiDepth(df, col("x"), buckets = 4,
        coarseWidth = 3.0)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, Some(5.0), 95L), (1L, Some(5.0), 0L),
      (2L, Some(5.0), 0L), (3L, None, 5L)))
  }

  test("conservation and coarse-width invariance on testdata") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, dir)
    val n = orders.count()
    val a = PartitionPlanner.equiDepth(orders, col("o_totalprice"), 16, 4096.0)
      .collect()
    assert(a.map(_.getLong(2)).sum == n)
    // max bucket within 1 row-group of ideal on near-unique values
    assert(a.map(_.getLong(2)).max <= n / 16 + 1)
    val b = PartitionPlanner.equiDepth(orders, col("o_totalprice"), 16, 57.0)
      .collect()
    assert(a.map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSeq
      == b.map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSeq,
      "coarseWidth must be result-invariant")
  }

  test("the value-grain running sum rides a PARTITIONED window (no " +
    "corpus-scale single-partition sort)") {
    val df = PartitionPlanner.equiDepthQuery(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.execution.window.WindowExec
    val wins = PlanWalk.collectPlan(df.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    // the value-grain cumsum MUST be partitioned by the coarse bucket;
    // unpartitioned windows are allowed only on the bucket-grain prefix
    // table (child output is (b, t) — never the value column v)
    val partitioned = wins.filter(_.partitionSpec.nonEmpty)
    val badGlobal = wins.filter(w => w.partitionSpec.isEmpty
      && w.child.output.exists(_.name == "v"))
    assert(partitioned.nonEmpty && badGlobal.isEmpty,
      df.queryExecution.executedPlan.toString)
  }
}
