package graft.dedup

import graft.SparkSpec

/** Blocking-quality contracts on a hand-built registry whose every
  * metric is computable on paper: the transitive A–C pair that no
  * block contains, the both-keys pair counted once, singleton
  * neutrality, and the reduction-ratio arithmetic.
  */
class BlockingQualitySpec extends SparkSpec {
  import spark.implicits._

  test("chain + both-keys + singleton: every released number matches " +
    "the paper computation") {
    // chain: A-(e1)-B-(p2)-C  => blocked pairs AB, BC; truth adds AC
    // both-keys: D, E share email AND phone => one candidate pair
    // singleton: F links to nothing
    val reg = Seq(
      (1L, "e1", "p1"), // A
      (2L, "e1", "p2"), // B
      (3L, "e2", "p2"), // C
      (4L, "e3", "p3"), // D
      (5L, "e3", "p3"), // E
      (6L, "e4", "p4")) // F
      .toDF("rid", "email", "phone")
    val r = BlockingQuality.metrics(reg).collect().head
    assert(r.getAs[Long]("n_records") === 6L)
    assert(r.getAs[Long]("n_email_pairs") === 2L)   // AB, DE
    assert(r.getAs[Long]("n_phone_pairs") === 2L)   // BC, DE
    assert(r.getAs[Long]("n_both_keys") === 1L)     // DE
    assert(r.getAs[Long]("n_candidate_pairs") === 3L) // AB, BC, DE
    assert(r.getAs[Long]("n_truth_pairs") === 4L)   // + transitive AC
    assert(r.getAs[Long]("n_transitive_only") === 1L)
    assert(r.getAs[Double]("pair_completeness") === 0.75)
    assert(r.getAs[Double]("reduction_ratio") === 0.8) // 1 - 3/15
  }

  test("a registry with no links at all reports zero pairs without " +
    "dividing by zero") {
    val reg = Seq((1L, "e1", "p1"), (2L, "e2", "p2"))
      .toDF("rid", "email", "phone")
    val r = BlockingQuality.metrics(reg).collect().head
    assert(r.getAs[Long]("n_candidate_pairs") === 0L)
    assert(r.getAs[Long]("n_truth_pairs") === 0L)
    assert(r.getAs[Long]("n_transitive_only") === 0L)
    // 0/0 completeness is undefined -> null, never a crash or a fake 1.0
    assert(r.isNullAt(r.fieldIndex("pair_completeness")))
    assert(r.getAs[Double]("reduction_ratio") === 1.0)
  }

  test("on the q164 registry the transitive-only count is exactly the " +
    "3-record chains' A-C closures") {
    val reg = GoldenRecord.dirtyRegistry(spark, "/root/testdata/sf0.001")
    val r = BlockingQuality.metrics(reg).collect().head
    // every %6 entity is a base-(email)-v1-(phone)-v2 chain whose
    // base-v2 pair exists only transitively
    val nChains = reg.filter($"rid" % 4 === 2).count()
    assert(r.getAs[Long]("n_transitive_only") === nChains)
    // blocked pairs always within clusters => completeness <= 1
    assert(r.getAs[Double]("pair_completeness") <= 1.0)
  }
}
