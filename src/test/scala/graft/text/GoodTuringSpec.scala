package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Good–Turing contracts: a hand-counted ladder, the unseen-mass
  * identity, and NULL (never fake) smoothing on empty buckets.
  */
class GoodTuringSpec extends SparkSpec {

  private def tokens(ws: String*) = {
    import spark.implicits._
    ws.toDF("token")
  }

  test("hand-counted ladder: N_r, r*, and P0 = N1/N") {
    // counts: a:3, b:2, c:2, d:1, e:1, f:1 -> N1=3, N2=2, N3=1, N=10
    val out = GoodTuring.ladder(tokens(
        "a", "a", "a", "b", "b", "c", "c", "d", "e", "f"), maxR = 4)
      .collect()
    val byR = out.map(r => r.getLong(0) -> r).toMap
    assert(byR(1L).getLong(1) === 3L && byR(2L).getLong(1) === 2L
      && byR(3L).getLong(1) === 1L && byR(4L).getLong(1) === 0L)
    // r*=  (1+1)*N2/N1 = 4/3 ; (2+1)*N3/N2 = 1.5
    assert(math.abs(byR(1L).getDouble(3) - 4.0 / 3.0) < 1e-6)
    assert(math.abs(byR(2L).getDouble(3) - 1.5) < 1e-6)
    // N4 = 0 -> r* for r=3 is NULL (smoothing from an empty bucket),
    // and r=4's own row reports n_r = 0 with NULL r*
    assert(byR(3L).isNullAt(3) && byR(4L).isNullAt(3))
    assert(byR(1L).getLong(4) === 10L && byR(1L).getLong(5) === 6L)
    assert(math.abs(byR(1L).getDouble(6) - 0.3) < 1e-9)
  }

  test("q193: totals consistent, P0 in (0,1), ladder rows complete") {
    val rows = GoodTuring.goodTuringQuery(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
    // the sf0.001 corpus has NO hapax tokens (tiny shared vocabulary),
    // so P0 legitimately reads 0 — the bound is [0, 1)
    val p0 = rows.head.getDouble(6)
    assert(p0 >= 0.0 && p0 < 1.0)
    // sum of r*N_r over ALL r equals the token total; the ladder's
    // slice of it cannot exceed it
    val partial = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(partial <= rows.head.getLong(4))
  }
}
