package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual-hash contracts: the byte round-trip (encode → header
  * parse → block sums) is exact, the 4-band LSH candidate generator is
  * COMPLETE for Hamming ≤ 3 (diffed against an in-test brute force),
  * the planted near-dups are recovered above a pinned recall floor,
  * and nothing un-planted sneaks in (random 64-bit hashes at this
  * corpus size are ~10⁻¹⁰ likely to land within 3 bits).
  */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("encode/parse round-trip: block sums from the payload equal " +
    "block sums from the pixel formula") {
    val bs = PerceptualHash.blockSums(PerceptualHash.encode(42L))
    val direct = new Array[Long](64)
    var i = 0
    while (i < 1024) {
      val (y, x) = (i / 32, i % 32)
      direct((y / 4) * 8 + x / 4) += PerceptualHash.pixel(42L, i)
      i += 1
    }
    assert(bs.toSeq === direct.toSeq)
    assert(bs.sum > 0L)
  }

  test("corrupt payloads are rejected, not mis-parsed") {
    val good = PerceptualHash.encode(7L)
    intercept[IllegalArgumentException] {
      PerceptualHash.blockSums(good.drop(1)) // magic gone
    }
    intercept[IllegalArgumentException] {
      PerceptualHash.blockSums(good.dropRight(3)) // truncated pixels
    }
  }

  test("planted near-dups (doc 4k vs 4k+1) differ by ~10 pixels and " +
    "few aHash bits; fresh images differ by many") {
    val h0 = PerceptualHash.hashes(PerceptualHash.blockSums(PerceptualHash.encode(8L)))
    val h1 = PerceptualHash.hashes(PerceptualHash.blockSums(PerceptualHash.encode(9L)))
    val h2 = PerceptualHash.hashes(PerceptualHash.blockSums(PerceptualHash.encode(10L)))
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(h0, h1) <= 6, s"planted pair too far: ${ham(h0, h1)}")
    assert(ham(h0, h2) >= 15, s"fresh pair too close: ${ham(h0, h2)}")
  }

  test("banding is a COMPLETE candidate generator for Hamming <= 3: " +
    "banded pairs equal the brute-force pair set") {
    val hashed = PerceptualHash.hashImages(spark,
      PerceptualHash.imageCorpus(spark, graft.Tables.documents(spark, dir)))
      .toDF()
    val rows = hashed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, hiA, loA) <- rows; (ib, hiB, loB) <- rows if ia < ib
      h = java.lang.Long.bitCount(hiA ^ hiB) + java.lang.Long.bitCount(loA ^ loB)
      if h <= 3
    } yield (ia, ib, h)).toSet
    val banded = PerceptualHash.nearDupPairs(hashed, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute)
  }

  test("q202 on testdata: every found pair is a planted (4k, 4k+1) " +
    "pair and recall is above the floor") {
    val pairs = PerceptualHash.imageNearDupQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(a % 4 === 0L && b === a + 1, s"un-planted pair ($a, $b)")
    }
    val nGroups = graft.Tables.documents(spark, dir)
      .select(max(col("doc_id"))).collect()(0).getLong(0) / 4 + 1
    val recall = pairs.length.toDouble / nGroups
    assert(recall >= 0.85, s"aHash recall $recall (${pairs.length}/$nGroups)")
  }

  test("q203 on testdata: dHash pairs are planted-only with recall " +
    "above the floor") {
    val pairs = PerceptualHash.imageDhashQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(a % 4 === 0L && b === a + 1, s"un-planted pair ($a, $b)")
    }
    val nGroups = graft.Tables.documents(spark, dir)
      .select(max(col("doc_id"))).collect()(0).getLong(0) / 4 + 1
    val recall = pairs.length.toDouble / nGroups
    assert(recall >= 0.85, s"dHash recall $recall (${pairs.length}/$nGroups)")
  }

  test("the (session, dir) hash-table memo is bit-identical to a fresh " +
    "decode of the same corpus") {
    val t1 = PerceptualHash.hashTable(spark, dir)
    assert(t1 eq PerceptualHash.hashTable(spark, dir),
      "second call must hit the memo")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val fresh = PerceptualHash.hashImages(spark,
      PerceptualHash.imageCorpus(spark,
        graft.Tables.documents(spark, dir))).toDF()
    assert(key(t1) == key(fresh),
      "memoized hash table must equal a fresh decode")
  }
}
