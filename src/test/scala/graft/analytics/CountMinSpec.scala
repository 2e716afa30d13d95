package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count–Min guarantees on real data: overestimate-only, the ε·N error
  * bound, and the mergeability the relational build rides on.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("estimates never underestimate, and top-20 keys stay within eps*N") {
    val out = CountMin.countMinQuery(spark, dir).collect()
    assert(out.length === 20)
    val n = spark.read.parquet(s"$dir/orders.parquet").count()
    // eps = e / w; the classic bound holds per row with prob 1 - e^-d —
    // with d = 4 a violation on ALL rows simultaneously is (e^-4)^20;
    // assert the bound itself, not just the union trend
    val epsN = math.ceil(math.E / CountMin.W * n).toLong
    out.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      assert(est >= exact, s"CMS underestimated: $r")
      assert(est - exact <= epsN, s"CMS error above eps*N=$epsN: $r")
    }
  }

  test("sketch of a union equals cell-wise sum of per-part sketches (mergeable)") {
    val a = Seq((1L, 5L), (2L, 3L), (100L, 7L)).toDF("key", "n")
    val b = Seq((1L, 2L), (7L, 1L)).toDF("key", "n")
    val whole = CountMin.sketch(a.unionByName(b))
      .orderBy("r", "bucket").collect().toSeq
    val merged = CountMin.sketch(a).unionByName(CountMin.sketch(b))
      .groupBy(col("r"), col("bucket")).agg(sum(col("c")).as("c"))
      .orderBy("r", "bucket").collect().toSeq
    assert(whole.map(_.toSeq) === merged.map(_.toSeq))
  }

  test("every key lands in exactly d cells with in-range buckets") {
    val keys = Seq(0L, 1L, 42L, 999999937L).toDF("key")
      .withColumn("n", lit(1L))
    val cells = CountMin.sketch(keys).collect()
    // 4 distinct keys x 4 rows, minus any same-row bucket collisions
    assert(cells.map(_.getLong(2)).sum === 16L)
    cells.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) < CountMin.W, r.toString)
    }
  }

  test("join-size estimate never underestimates and is exact when no " +
    "bucket collisions exist (distinct small keys)") {
    // 30 distinct keys over 1024 buckets in every row: with these fixed
    // affine hashes the 30 keys land collision-free, so the inner
    // product is EXACT — pinning both the estimator arithmetic and the
    // overestimate-only direction (checked on the real corpus below).
    val a = (0 until 30).map(k => (k.toLong, (k % 5 + 1).toLong))
      .toDF("key", "n")
    val b = (0 until 30).map(k => (k.toLong, (k % 3 + 1).toLong))
      .toDF("key", "n")
    val est = CountMin.joinSizeEstimate(a, b).collect()(0).getLong(0)
    val exact = (0 until 30).map(k => (k % 5 + 1).toLong * (k % 3 + 1)).sum
    assert(est == exact, s"collision-free estimate must be exact: $est vs $exact")
  }

  test("q163 on the real corpus: both estimates overestimate-only, " +
    "exact twins match brute force, disjoint domains estimate ~0") {
    val rows = CountMin.joinSizeQuery(spark, dir).collect()
      .map(r => r.getAs[String]("join_name") ->
        (r.getAs[Long]("exact_n"), r.getAs[Long]("cms_est"))).toMap
    assert(rows.keySet == Set("orders_events_cust", "lineitem_self_part"))
    for ((name, (exact, est)) <- rows) {
      assert(est >= exact, s"$name: CM inner product must not underestimate")
    }
    // brute-force the self-join exact twin
    val f2 = graft.Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).collect()(0).getLong(0)
    assert(rows("lineitem_self_part")._1 == f2)
    // disjoint key domains: exact 0; the estimate is pure collision noise
    val lo = (0 until 50).map(k => (k.toLong, 2L)).toDF("key", "n")
    val hi = (1000 until 1050).map(k => (k.toLong, 2L)).toDF("key", "n")
    val exD = lo.join(hi.select(col("key"), col("n").as("nb")), Seq("key"))
      .agg(coalesce(sum(col("n") * col("nb")), lit(0L))).collect()(0).getLong(0)
    assert(exD == 0L)
  }
}
