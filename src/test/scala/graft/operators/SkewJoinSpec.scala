package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one pathologically hot key (90% of rows) + a long tail
  val big = ((1 to 900).map(i => ("hot", i.toLong))
    ++ (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "payload")
  val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"dim_$i") }.toDF("key", "attr")

  test("salted join result equals plain join (inner)") {
    val plain = big.join(small, Seq("key"), "inner")
    val salted = SkewJoin.saltedJoin(big, small, "key", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    assert(diff == 0)
  }

  test("salted join result equals plain join (left, unmatched keys survive)") {
    val bigger = big.union(Seq(("orphan", 0L)).toDF("key", "payload"))
    val plain = bigger.join(small, Seq("key"), "left")
    val salted = SkewJoin.saltedJoin(bigger, small, "key", salts = 4, "left")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("outer joins that would duplicate unmatched small-side rows are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "key", salts = 4, joinType = "full")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "key", salts = 4, joinType = "right")
    }
  }

  test("salt actually spreads the hot key across buckets") {
    val salts = 8
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val spread = saltedBig.filter(col("key") === "hot")
      .groupBy(col("_salt")).count().collect()
    assert(spread.length >= salts - 1) // ~uniform occupancy, allow one empty
    assert(spread.map(_.getLong(1)).max < 900) // no bucket holds everything
  }

  test("keySkewProfile surfaces the hot key first") {
    val prof = SkewJoin.keySkewProfile(big, "key", topN = 3).collect()
    assert(prof.head.getString(0) == "hot")
    assert(prof.head.getLong(1) == 900L)
  }
}
