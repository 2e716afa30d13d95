package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Jackknife contracts: an in-memory brute-force recompute on a seeded
  * fixture, the single-bucket degenerate case, and CI sanity on the
  * testdata corpus.
  */
class JackknifeSpec extends SparkSpec {

  test("matches a brute-force delete-one-bucket recompute on a fixture") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toLong, 100L + rng.nextInt(5000)))
    val df = rows.toDF("g", "k", "cents")
    val out = Jackknife.groupedMeanCi(df, col("g"), col("cents"),
        pmod(col("k"), lit(8)).cast("int"), nBuckets = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b")) {
      val xs = rows.filter(_._1 == g)
      val cells = xs.groupBy(t => (t._2 % 8).toInt).toSeq.sortBy(_._1)
        .map { case (b, ts) => (b, ts.size.toLong, ts.map(_._3).sum) }
      val n = cells.map(_._2).sum; val s = cells.map(_._3).sum
      val thetas = cells.map(c => (s - c._3).toDouble / (n - c._2).toDouble)
      val bar = thetas.sum / cells.size
      val se = math.sqrt(thetas.map(t => (t - bar) * (t - bar)).sum
        * (cells.size - 1).toDouble / cells.size)
      val r = out(g)
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(3) - s.toDouble / n / 100.0) < 1e-4)
      assert(math.abs(r.getDouble(4) - se / 100.0) < 1e-6)
      assert(math.abs(r.getDouble(5) - (s.toDouble / n - 1.96 * se) / 100.0) < 1e-4)
    }
  }

  test("a group confined to one bucket degrades to SE 0, CI = point") {
    import spark.implicits._
    val df = Seq(("solo", 3L, 500L), ("solo", 3L, 700L))
      .toDF("g", "k", "cents")
    val r = Jackknife.groupedMeanCi(df, col("g"), col("cents"),
      pmod(col("k"), lit(8)).cast("int"), nBuckets = 8).head
    assert(r.getLong(2) === 1L && r.getDouble(4) === 0.0)
    assert(r.getDouble(5) === r.getDouble(3) && r.getDouble(6) === r.getDouble(3))
  }

  test("testdata CIs bracket the mean and SEs are non-negative") {
    val q = Jackknife.jackknifeQuery(spark, "/root/testdata/sf0.001").collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getDouble(4) >= 0.0)
      assert(r.getDouble(5) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(6))
    }
  }
}
