package graft.graph

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")
  private def seeds(rows: (Long, Int)*) = rows.toDF("id", "label")

  test("majority vote with smallest-label tie-break, frozen seeds") {
    // vertex 10 has labeled neighbors 1(a=0), 2(a=0), 3(b=1) -> majority 0
    // vertex 11 has neighbors 3(b=1), 4(c=2) -> tie -> smaller label 1
    val e = edges((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L), (4L, 11L))
    val s = seeds((1L, 0), (2L, 0), (3L, 1), (4L, 2))
    val out = LabelProp.propagate(e, s, rounds = 1).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(10L) === ((0, 1)))
    assert(out(11L) === ((1, 1)))
    assert(out(1L) === ((0, 0)), "seeds keep round 0")
    assert(out.size === 6)
  }

  test("labels spread one hop per round and freeze on first assignment") {
    // chain 1 - 2 - 3 - 4, seed at 1
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val s = seeds((1L, 7))
    val out = LabelProp.propagate(e, s, rounds = 3).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out === Map(
      1L -> ((7, 0)), 2L -> ((7, 1)), 3L -> ((7, 2)), 4L -> ((7, 3))))
  }

  test("disconnected vertices stay unlabeled") {
    val e = edges((1L, 2L), (8L, 9L))
    val s = seeds((1L, 5))
    val ids = LabelProp.propagate(e, s, rounds = 3).collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L))
  }

  test("propagation is symmetric over directed input edges") {
    // seed at the DST side of the only edge still labels the src side
    val e = edges((6L, 1L))
    val s = seeds((1L, 3))
    val out = LabelProp.propagate(e, s, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(6L) === 3)
  }
}
