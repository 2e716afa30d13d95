package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD2 contracts: the round-trip law (reconstruct(v) ≡ snapshot(v) for
  * every version — the pair's defining property), the change/delete/
  * reappear run semantics on a planted micro-dimension, and the
  * is_current ↔ open-validity equivalence.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val payload = Seq("price", "status")

  test("round-trip law: asOf(history, v) equals the direct snapshot at " +
    "every version (testdata)") {
    val dir = "/root/testdata/sf0.001"
    val snaps = Scd2.versionedOrders(spark, dir).cache()
    val history = Scd2.buildHistory(snaps, "o_orderkey",
      Seq("o_totalprice", "o_orderstatus"), maxVersion = 4L).cache()
    try {
      for (v <- 1L to 4L) {
        val rebuilt = Scd2.asOf(history, "o_orderkey",
            Seq("o_totalprice", "o_orderstatus"), v)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
          .toSet
        val direct = snaps.filter(col("version") === v)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
          .toSet
        assert(rebuilt == direct, s"round trip diverged at version $v")
      }
    } finally spark.catalog.clearCache()
  }

  test("planted runs: change, delete-then-reappear, single-version key") {
    // key 1: A at v1-2, B at v3-4          → [1,3) A, [3,null) B current
    // key 2: A at v1, absent v2, A at v3-4 → [1,2) A, [3,null) A current
    // key 3: A only at v2                  → [2,3) A, not current
    // key 4: A at all four versions        → [1,null) A current
    val snaps = Seq(
      (1L, 1L, 10.0, "A"), (2L, 1L, 10.0, "A"), (3L, 1L, 20.0, "B"),
      (4L, 1L, 20.0, "B"),
      (1L, 2L, 10.0, "A"), (3L, 2L, 10.0, "A"), (4L, 2L, 10.0, "A"),
      (2L, 3L, 5.0, "A"),
      (1L, 4L, 10.0, "A"), (2L, 4L, 10.0, "A"), (3L, 4L, 10.0, "A"),
      (4L, 4L, 10.0, "A"))
      .toDF("version", "key", "price", "status")
    val h = Scd2.buildHistory(snaps, "key", payload, maxVersion = 4L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5))).toSet
    assert(h == Set(
      (1L, 10.0, "A", 1L, Some(3L), false),
      (1L, 20.0, "B", 3L, None, true),
      (2L, 10.0, "A", 1L, Some(2L), false),
      (2L, 10.0, "A", 3L, None, true),
      (3L, 5.0, "A", 2L, Some(3L), false),
      (4L, 10.0, "A", 1L, None, true)), h.toSeq.sortBy(x => (x._1, x._4)))
  }

  test("fact enrichment resolves validity boundaries exactly; deleted " +
    "members surface as nulls") {
    // dimension: key 1 has payload A on [1,3), B on [3,null); key 2 is
    // deleted at version 2 ([1,2) only). Facts probe the boundaries:
    // version 2 (last of run A), 3 (first of run B), and the deleted slot.
    val snaps = Seq(
      (1L, 1L, 10.0, "A"), (2L, 1L, 10.0, "A"), (3L, 1L, 20.0, "B"),
      (4L, 1L, 20.0, "B"),
      (1L, 2L, 99.0, "Z"))
      .toDF("version", "key", "price", "status")
    val hist = Scd2.buildHistory(snaps, "key", payload, maxVersion = 4L)
    val facts = Seq((1L, 100L, 2L), (1L, 101L, 3L), (2L, 102L, 1L),
      (2L, 103L, 3L))
      .toDF("key", "fact_id", "tv")
    val out = Scd2.enrichFacts(facts, hist, "key", "tv", payload)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.getString(4)))).toMap
    assert(out(100L) == (Some(10.0), Some("A")), "last version of run A")
    assert(out(101L) == (Some(20.0), Some("B")), "first version of run B")
    assert(out(102L) == (Some(99.0), Some("Z")), "present version")
    assert(out(103L) == (None, None), "deleted member must null, not drop")
    assert(Scd2.enrichFacts(facts, hist, "key", "tv", payload).count() == 4,
      "enrichment must be row-preserving")
  }

  test("is_current holds exactly on open-validity rows; intervals per key " +
    "never overlap") {
    val dir = "/root/testdata/sf0.001"
    val history = Scd2.buildHistory(Scd2.versionedOrders(spark, dir),
      "o_orderkey", Seq("o_totalprice", "o_orderstatus"), maxVersion = 4L)
      .cache()
    try {
      assert(history.filter(col("is_current") =!= col("valid_to").isNull)
        .count() == 0)
      // no two rows of one key may cover the same version
      val overlaps = history.as("a").join(history.as("b"),
        col("a.o_orderkey") === col("b.o_orderkey")
          && col("a.valid_from") < col("b.valid_from")
          && (col("a.valid_to").isNull
            || col("a.valid_to") > col("b.valid_from"))).count()
      assert(overlaps == 0, "overlapping validity intervals")
    } finally spark.catalog.clearCache()
  }
}
