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
}
