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

  test("leakage-safe split: near-dups share a split; singletons keep per-id labels") {
    // ids 1 and 4 hash to DIFFERENT per-row splits (train vs test) — that
    // is the leakage scenario; make them near-identical documents and the
    // cluster split must unify them under cluster_id = 1
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val solo = Sampling
      .leakageSafeSplit(Seq((4L, text)).toDF("doc_id", "text"), k = 5,
        threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(solo.toSeq == Seq((4L, 4L, "test"))) // per-id label pre-cluster
    val out = Sampling.leakageSafeSplit(
      Seq(1L -> text, 4L -> text,
        2L -> "entirely different words with no shingle overlap at all here")
        .toDF("doc_id", "text"), k = 5, threshold = 0.2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) == ((1L, "train")))
    assert(out(4L) == ((1L, "train"))) // pulled into doc 1's cluster+split
    assert(out(2L) == ((2L, "train"))) // singleton: own id, own label
  }

  test("weighted sample: keep rate tracks weight, deterministic, capped at 1") {
    // two weight classes, 9:1 — the heavy class must be kept at ~9× the
    // light class's rate (up to the p=1 cap), and re-runs are identical
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) 9.0 else 1.0))
      .toDF("id", "w")
    val kept = Sampling.weightedSample(df, "id", "w", targetFrac = 0.2)
    val rates = kept.groupBy(col("w")).count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // mean w = 5: p_heavy = min(1, .2*9/5) = 0.36, p_light = .2*1/5 = 0.04
    assert(rates(9.0) > 280 && rates(9.0) < 440, rates.toString) // 1000·0.36
    assert(rates(1.0) > 10 && rates(1.0) < 90, rates.toString)   // 1000·0.04
    val again = Sampling.weightedSample(df, "id", "w", targetFrac = 0.2)
    assert(kept.select("id").as[Long].collect().sorted.toSeq
      == again.select("id").as[Long].collect().sorted.toSeq)
    // a weight far above the mean caps at p=1: that row is ALWAYS kept
    // (uniform weights would normalize out — w/mean(w) = 1 regardless)
    val spiked = (0L until 2000L).map(i => (i, if (i == 7L) 1e9 else 1.0))
      .toDF("id", "w")
    val keptIds = Sampling.weightedSample(spiked, "id", "w", targetFrac = 0.2)
      .select("id").as[Long].collect().toSet
    assert(keptIds.contains(7L))
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
