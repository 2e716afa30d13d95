package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("nearest-rank quantiles match the brute-force sort") {
    val vals = Seq.tabulate(1000)(i => ((i * 7919) % 1000).toDouble + 0.5)
    val df = vals.toDF("x")
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val got = Quantiles.globalQuantiles(df, "x", qs, bucketWidth = 64.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val k = math.ceil(q * vals.size).toLong
      assert(got(q) === sorted((k - 1).toInt),
        s"q=$q: expected rank-$k value ${sorted((k - 1).toInt)}, got ${got(q)}")
    }
  }

  test("duplicates and skewed buckets still select the exact rank") {
    // 90% of the mass in one bucket, plus duplicate values at the cut
    val vals = Seq.fill(90)(10.0) ++ Seq(1.0, 2.0, 3.0, 4.0, 5.0,
      100.0, 200.0, 300.0, 400.0, 500.0)
    val df = vals.toDF("x")
    val got = Quantiles.globalQuantiles(df, "x", Seq(0.5, 0.99), bucketWidth = 8.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    assert(got(0.5) === sorted(math.ceil(0.5 * 100).toInt - 1))   // 10.0
    assert(got(0.99) === sorted(math.ceil(0.99 * 100).toInt - 1)) // 400.0
  }

  test("grouped quantiles match per-group brute force (uneven group sizes)") {
    val rows =
      Seq.tabulate(700)(i => ("a", ((i * 7919) % 700).toDouble + 0.25)) ++
      Seq.tabulate(40)(i => ("b", (i * 13).toDouble)) ++
      Seq(("c", 5.0)) // single-element group: every q selects that element
    val df = rows.toDF("g", "x")
    val qs = Seq(0.25, 0.5, 0.9)
    val got = Quantiles.groupedQuantiles(df, "g", "x", qs, bucketWidth = 32.0)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.size === 9)
    for ((g, vals) <- rows.groupBy(_._1); q <- qs) {
      val sorted = vals.map(_._2).sorted
      val k = math.ceil(q * sorted.size).toInt
      assert(got((g, q)) === sorted(k - 1),
        s"group $g q=$q: expected ${sorted(k - 1)}, got ${got((g, q))}")
    }
  }

  test("grouped: NO empty-keyed window anywhere (prefix sum rides the group key)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Seq.tabulate(5000)(i => (s"g${i % 3}", i.toDouble)).toDF("g", "x")
    val q = Quantiles.groupedQuantiles(df, "g", "x", Seq(0.5), bucketWidth = 100.0)
    val plan = graft.operators.PlanWalk.executedPlanOf(q)
    val windows = graft.operators.PlanWalk.collectPlan(plan) {
      case w: WindowExec => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty), plan.toString)
  }

  test("the rank window is partitioned; only the histogram prefix sum is global") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Seq.tabulate(5000)(i => i.toDouble).toDF("x")
    val q = Quantiles.globalQuantiles(df, "x", Seq(0.5), bucketWidth = 100.0)
    val plan = graft.operators.PlanWalk.executedPlanOf(q)
    val windows = graft.operators.PlanWalk.collectPlan(plan) {
      case w: WindowExec => w
    }
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    // exactly one empty-keyed window — the dimension-sized histogram
    // prefix sum — and it must not be the pass-2 rank window
    assert(unpartitioned.size === 1, plan.toString)
    assert(unpartitioned.head.windowExpression.mkString.contains("sum"),
      s"the global window must be the prefix sum, got:\n${unpartitioned.head}")
    assert(windows.exists(w => w.partitionSpec.nonEmpty &&
      w.windowExpression.mkString.contains("sum")),
      s"the rank (cumulative-count) window must be partitioned by q:\n$plan")
  }

  test("adversarial: 99% of the mass in ONE bucket refines to slices under the bound") {
    // 4950 values spread inside bucket [0, 64) + 50 stragglers elsewhere;
    // cap = 100 forces a 50-way split of the heavy bucket
    val vals = Seq.tabulate(4950)(i => i * 64.0 / 4950.0) ++
      Seq.tabulate(50)(i => 1000.0 + i)
    val df = vals.toDF("x")
    // the bound, asserted on the PRODUCTION refinement path: no
    // (bucket, sub-bucket) slice — the unit a pass-2 partition holds —
    // exceeds maxBucketRows
    val slices = Quantiles.refinedBuckets(df, "x", 64.0, 100L)
      .groupBy("b", "s").count().collect().map(_.getLong(2))
    assert(slices.max <= 100L, s"max slice ${slices.max} > 100")
    assert(slices.length >= 50, "the heavy bucket must actually split")
    // and the refined path still selects the exact ranks
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val got = Quantiles.globalQuantiles(df, "x", qs, 64.0, maxBucketRows = 100L)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val k = math.ceil(q * vals.size).toInt
      assert(got(q) === sorted(k - 1), s"q=$q")
    }
  }

  test("adversarial: a single value repeated past any split collapses before the rank window") {
    // value-range splitting cannot separate identical values; the pass-2
    // value collapse must keep the result exact anyway
    val vals = Seq.fill(5000)(10.0) ++ Seq(1.0, 2.0, 3.0, 500.0, 501.0)
    val df = vals.toDF("x")
    val qs = Seq(0.01, 0.5, 0.999, 1.0)
    val got = Quantiles.globalQuantiles(df, "x", qs, 64.0, maxBucketRows = 50L)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val k = math.ceil(q * vals.size).toInt
      assert(got(q) === sorted(k - 1), s"q=$q")
    }
  }

  test("adversarial grouped: heavy skewed group with a tiny cap stays exact") {
    val rows =
      Seq.tabulate(3000)(i => ("heavy", 32.0 + i * 32.0 / 3000.0)) ++ // one bucket
      Seq.fill(500)(("heavy", 10.0)) ++                               // repeated value
      Seq.tabulate(30)(i => ("light", (i * 7).toDouble))
    val df = rows.toDF("g", "x")
    val qs = Seq(0.25, 0.5, 0.9)
    val got = Quantiles.groupedQuantiles(df, "g", "x", qs, bucketWidth = 64.0,
        maxBucketRows = 100L)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for ((g, vs) <- rows.groupBy(_._1); q <- qs) {
      val sorted = vs.map(_._2).sorted
      val k = math.ceil(q * sorted.size).toInt
      assert(got((g, q)) === sorted(k - 1), s"group $g q=$q")
    }
  }
}
