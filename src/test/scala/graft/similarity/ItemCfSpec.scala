package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Item-CF contracts: hand-computed cosines on a planted basket set,
  * the megabasket cap (degrees computed AFTER the cap so norms match
  * pair counts), symmetry of the co table, and range/cap-visibility
  * invariants on testdata.
  */
class ItemCfSpec extends SparkSpec {
  import spark.implicits._

  // baskets: {1,2,3}, {1,2}, {2,3}, {1}   (items 1,2,3)
  // deg: 1→3, 2→3, 3→2
  // co:  (1,2)=2, (1,3)=1, (2,3)=2
  // cos: (1,2)=2/3≈0.6667, (1,3)=1/√6≈0.4082, (2,3)=2/√6≈0.8165
  private val baskets = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (11L, 1L), (11L, 2L),
    (12L, 2L), (12L, 3L),
    (13L, 1L))
    .toDF("basket_id", "item_id")

  test("hand-computed cosines and per-item ranking") {
    val out = ItemCf.topNeighbors(baskets, maxBasket = 16, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      (1L, 1L, 2L, 0.6667), (1L, 2L, 3L, 0.4082),
      (2L, 1L, 3L, 0.8165), (2L, 2L, 1L, 0.6667),
      (3L, 1L, 2L, 0.8165), (3L, 2L, 1L, 0.4082)))
  }

  test("megabasket cap drops the basket AND its degree contribution — " +
    "cosines stay <= 1") {
    // with cap 2, basket 10 (3 items) is dropped: deg 1→2, 2→2, 3→1;
    // co (1,2)=1 from basket 11, (2,3)=1 from basket 12; (1,3) gone
    val out = ItemCf.topNeighbors(baskets, maxBasket = 2, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      (1L, 2L, 0.5), (2L, 1L, 0.5),
      (2L, 3L, 1.0 / math.sqrt(2.0)), (3L, 2L, 1.0 / math.sqrt(2.0)))
      .map(t => (t._1, t._2, math.rint(t._3 * 1e4) / 1e4)))
  }

  test("cappedStats reports the dropped megabaskets") {
    val s = ItemCf.cappedStats(baskets, maxBasket = 2).collect().head
    assert((s.getLong(0), s.getLong(1)) == (4L, 1L))
  }

  test("testdata invariants: cosine in (0, 1], ranks dense from 1, " +
    "neighbor lists symmetric at co level") {
    val out = ItemCf.itemCfQuery(spark, "/root/testdata/sf0.001").cache()
    try {
      assert(out.filter(col("cosine") <= 0.0 || col("cosine") > 1.0)
        .count() == 0)
      // ranks are 1..n_i per item with no gaps
      val badRnk = out.groupBy(col("item_id"))
        .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"),
          min(col("rnk")).as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1L).count()
      assert(badRnk == 0)
    } finally spark.catalog.clearCache()
  }
}
