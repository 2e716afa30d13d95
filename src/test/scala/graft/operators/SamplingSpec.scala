package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  val ids = (0L until 1000L).toDF("id")

  test("splitLabel: deterministic, all labels present, ~80/10/10") {
    val counts = ids.groupBy(Sampling.splitLabel(col("id")).as("s"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 700 && counts("train") < 900, counts.toString)
    assert(counts("val") > 50 && counts("val") < 160, counts.toString)
    assert(counts("test") > 50 && counts("test") < 160, counts.toString)
    // re-evaluation assigns identically (pure arithmetic, no RNG)
    val again = ids.groupBy(Sampling.splitLabel(col("id")).as("s"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("hash buckets: low bits of the multiplicative hash are NOT echoed") {
    // with K ≡ 1 (mod 10) a naive (id·K) mod 10 would return id mod 10;
    // high-bit extraction must break that correlation
    val echo = ids.filter(Sampling.hashBucket(col("id"), 10) === pmod(col("id"), lit(10L)))
      .count()
    assert(echo < 300, s"$echo of 1000 echoed id mod 10")
  }

  test("stratified sample: exact ceil(n·frac) per stratum, deterministic") {
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "es" else "fr"))
      .toDF("doc_id", "lang")
    val s1 = Sampling.stratifiedSample(df, "doc_id", "lang", 0.2)
    val perStratum = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum == Map("en" -> 20L, "es" -> 20L, "fr" -> 20L)) // ceil(100·0.2)
    val s2 = Sampling.stratifiedSample(df, "doc_id", "lang", 0.2)
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq
      == s2.select("doc_id").as[Long].collect().sorted.toSeq)
    // frac=1 keeps everything
    assert(Sampling.stratifiedSample(df, "doc_id", "lang", 1.0).count() == 300)
  }
}
