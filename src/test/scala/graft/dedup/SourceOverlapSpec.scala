package graft.dedup

import graft.SparkSpec

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("shared shingles count once per pair regardless of doc multiplicity") {
    val leaked = "one two three four five"
    val d = docs(
      (1L, "a", leaked + " tail tokens here"),
      (2L, "a", leaked),                       // same shingle twice in a
      (3L, "b", leaked + " other suffix"),
      (4L, "c", "completely different text with no overlap at all"))
    val m = SourceOverlap.sourceOverlap(d, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a∩b share exactly the one leaked 5-gram (distinct per source)
    assert(m(("a", "b")) === 1L)
    assert(!m.contains(("a", "c")) && !m.contains(("b", "c")))
  }

  test("containment is n_common over the smaller side") {
    // a has 4 shingles, b has 1, all of b's inside a
    val d = docs(
      (1L, "a", "w1 w2 w3 w4 w5 w6 w7 w8"),     // 4 5-shingles
      (2L, "b", "w3 w4 w5 w6 w7"))              // 1 5-shingle, contained
    val r = SourceOverlap.sourceOverlap(d, k = 5).collect()
    assert(r.length === 1)
    assert(r.head.getLong(2) === 1L)
    assert(r.head.getDouble(3) === 1.0, "b fully contained in a")
  }

  test("symmetric ordering: source_a < source_b always") {
    val t = "alpha beta gamma delta epsilon"
    val d = docs((1L, "z", t), (2L, "m", t), (3L, "a", t))
    val pairs = SourceOverlap.sourceOverlap(d, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSet === Set(("a", "m"), ("a", "z"), ("m", "z")))
    assert(pairs.forall { case (a, b) => a < b })
  }
}
