package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.Tables
import graft.functions.GraftFunctions

/** Bloom-prefiltered semi-join: reduce the BIG side of an equi-semi-join
  * before it reaches the exchange, using a Bloom filter built over the
  * small side's keys.
  *
  * The regime this targets at 100 TB: the small side is too large to
  * broadcast as a hash relation (tens of millions of keys ⇒ GBs of
  * UnsafeRows per executor) but its BLOOM summary is megabytes
  * (~1.2 bytes/key at 3% fpp). Filtering the big side's scan output by
  * `might_contain` drops the vast majority of non-matching rows before
  * the shuffle; the exact semi-join afterwards removes the false
  * positives, so the composition is semantics-neutral — exactly Spark's
  * own runtime row-level filtering, made available as an explicit,
  * tunable operator (Spark only injects its version under conf
  * thresholds and creation-cost heuristics it controls).
  *
  * The built filter is collected to the driver as ONE binary value and
  * inlined as a literal — the broadcast-variable pattern (and a hard
  * requirement: `BloomFilterMightContain` only accepts a foldable bloom
  * input). Keys are pre-hashed to int64 with xxhash64 on BOTH sides so
  * the filter stores fixed-width longs regardless of key type.
  */
object BloomJoin {

  /** Exact semi-join `big ⋉ small` on big(bigKey) = small(smallKey),
    * with the big side pre-filtered through a Bloom summary of the
    * small side's keys.
    *
    * @param expectedItems sizing estimate for the filter (small-side
    *                      distinct keys); fpp degrades gracefully if
    *                      exceeded, correctness never depends on it
    */
  def semiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    GraftFunctions.register(big.sparkSession)
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val bloom = small
      .agg(call_function("graft_bloom_agg", xxhash64(col(smallKey)),
        lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    big
      .filter(call_function("graft_bloom_contains", lit(bloom),
        xxhash64(col(bigKey))))
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }

  /** q96: revenue by order priority counting only orders by high-balance
    * customers — the flagged-customer semi-join routed through the Bloom
    * prefilter. The oracle is the PLAIN semi-join (the prefilter must be
    * invisible in the result).
    */
  def flaggedRevenueQuery(s: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"))
    semiJoin(Tables.orders(s, dir), "o_custkey", flagged, "c_custkey",
        expectedItems = 100000L)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("priority"))
  }
}
