package graft.analytics

import graft.SparkSpec

class SketchSpec extends SparkSpec {

  test("q82: HLL estimates track exact counts; union merges without rescan") {
    val rows = CoreQueries.hllUserSketches(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (types, all) = rows.partition(_._1 != "__all__")
    assert(all.size == 1 && types.nonEmpty)
    // m=1024 relational HLL → linear-counting rsd well under 5% at these
    // cardinalities (measured worst 1.9% at sf0.1); 5% is the floor
    rows.values.foreach { case (est, exact) =>
      assert(math.abs(est - exact) <= math.max(1L, (0.05 * exact).toLong),
        s"estimate $est too far from exact $exact")
    }
    // the union estimate must cover every per-type exact count (distinct
    // users of a type are a subset of all users)
    val (estAll, exactAll) = all.values.head
    assert(types.values.map(_._2).max <= exactAll)
    assert(estAll >= (0.95 * types.values.map(_._2).max).toLong)
  }
}
