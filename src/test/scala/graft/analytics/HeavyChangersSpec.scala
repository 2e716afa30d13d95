package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyChangersSpec extends SparkSpec {
  import spark.implicits._

  private def run(base: Seq[Long], cur: Seq[Long], k: Int) =
    HeavyChangers.heavyChangers(base.toDF("key"), cur.toDF("key"), k)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))

  test("hand-built halves: exact counts, one-sided keys via the " +
    "full-outer coalesce, strict threshold at the integer boundary") {
    // n_b = 8, n_c = 8, k = 4 => survive iff |delta| * 4 > 16, |delta| > 4
    val base = Seq.fill(6)(1L) ++ Seq(2L, 3L)           // key 1 heavy in base
    val cur = Seq.fill(6)(9L) ++ Seq(2L, 3L)            // key 9 only in cur
    val got = run(base, cur, k = 4)
    assert(got == Seq((1L, 6L, 0L, -6L), (9L, 0L, 6L, 6L))
      || got == Seq((9L, 0L, 6L, 6L), (1L, 6L, 0L, -6L)))
    // |delta| = 4 exactly: 4*4 = 16 is NOT > 16 — excluded
    val b2 = Seq.fill(4)(1L) ++ Seq.fill(4)(2L)
    val c2 = Seq.fill(8)(2L)
    assert(run(b2, c2, k = 4).isEmpty,
      "the boundary |delta|*k == n_b+n_c must not pass the strict >")
  }

  test("ties in |delta| order by key ascending") {
    val base = Seq.fill(5)(7L) ++ Seq.fill(5)(3L)
    val cur = Seq.fill(5)(8L) ++ Seq.fill(5)(4L)
    val got = run(base, cur, k = 5) // |delta|*5 = 25 > 20

    assert(got.map(_._1) == Seq(3L, 4L, 7L, 8L), s"got $got")
  }

  test("MG coverage under eviction: high-cardinality halves with " +
    "planted changers match a direct in-memory computation") {
    val rnd = new scala.util.Random(42)
    // 500 distinct background keys (evicts k=16 buffers constantly),
    // plus planted changers
    val base = Seq.fill(400)(rnd.nextInt(500).toLong) ++ Seq.fill(80)(9001L)
    val cur = Seq.fill(400)(rnd.nextInt(500).toLong) ++ Seq.fill(90)(9002L)
    val k = 16
    val got = run(base, cur, k)
    val bc = base.groupBy(identity).map { case (x, v) => x -> v.size.toLong }
    val cc = cur.groupBy(identity).map { case (x, v) => x -> v.size.toLong }
    val want = (bc.keySet ++ cc.keySet).toSeq
      .map(x => (x, bc.getOrElse(x, 0L), cc.getOrElse(x, 0L)))
      .map { case (x, b, c) => (x, b, c, c - b) }
      .filter { case (_, _, _, d) =>
        math.abs(d) * k > base.size.toLong + cur.size.toLong }
      .sortBy { case (x, _, _, d) => (-math.abs(d), x) }
    assert(got == want, s"eviction lost a changer: got=$got want=$want")
    assert(want.exists(_._1 == 9001L) && want.exists(_._1 == 9002L),
      "the planted changers must be above the threshold")
  }

  test("q167 on the real corpus equals a direct in-memory recompute") {
    val dir = "/root/testdata/sf0.001"
    val got = HeavyChangers.heavyChangersQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mid = ev.map(_._1).max / 2.0
    val b = ev.filter(_._1 <= mid).groupBy(_._2).map { case (u, v) => u -> v.size.toLong }
    val c = ev.filter(_._1 > mid).groupBy(_._2).map { case (u, v) => u -> v.size.toLong }
    val nb = b.values.sum; val nc = c.values.sum
    val want = (b.keySet ++ c.keySet).toSeq
      .map(u => (u, b.getOrElse(u, 0L), c.getOrElse(u, 0L)))
      .map { case (u, x, y) => (u, x, y, y - x) }
      .filter { case (_, _, _, d) => math.abs(d) * 512L > nb + nc }
      .sortBy { case (u, _, _, d) => (-math.abs(d), u) }
    assert(got == want)
    assert(got.nonEmpty, "sf0.001 has changers above the 1/512 threshold")
  }
}
