package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-prefiltered semi-join equals the plain semi-join") {
    val rnd = new scala.util.Random(41)
    val big = (1 to 5000).map(_ => (rnd.nextInt(2000).toLong,
      rnd.nextInt(100))).toDF("k", "v").repartition(7)
    val small = (1 to 300).map(_ => rnd.nextInt(2000).toLong)
      .toDF("sk") // duplicates included: semi-join must not multiply rows
    val viaBloom = BloomJoin.semiJoin(big, "k", small, "sk",
        expectedItems = 500L)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val plain = big.join(small.select($"sk".as("k")).distinct(),
        Seq("k"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(viaBloom.toSeq == plain.toSeq && plain.nonEmpty)
  }

  test("false positives are removed: disjoint key spaces yield zero rows") {
    // undersized filter ⇒ high fpp ⇒ the prefilter alone WOULD leak rows;
    // the exact join behind it must still return none
    val big = (1L to 3000L).map(i => (i, "x")).toDF("k", "v")
    val small = (100001L to 100400L).toDF("sk")
    val out = BloomJoin.semiJoin(big, "k", small, "sk", expectedItems = 10L)
    assert(out.count() == 0)
  }

  test("the prefilter actually prunes (bloom pass-through is not a no-op)") {
    val big = (1L to 10000L).map(i => (i, i % 7)).toDF("k", "v")
    val small = Seq(3L, 5L, 8L).toDF("sk")
    // count rows surviving JUST the bloom pass (re-create the filter here)
    graft.functions.GraftFunctions.register(spark)
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(10L, 0.03)
    val bloom = small.agg(call_function("graft_bloom_agg",
        xxhash64(col("sk")), lit(10L), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val pruned = big.filter(call_function("graft_bloom_contains",
      lit(bloom), xxhash64(col("k")))).count()
    assert(pruned < 200, s"bloom kept $pruned of 10000 rows") // ≥98% pruned
    assert(pruned >= 3) // never drops a true match
  }
}
