package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("PMI matches the hand formula and normalizes away popularity") {
    // 'rare pair' always co-occurs (2 of each, 2 pair hits); 'the end'
    // co-occurs twice but 'the' is everywhere -> lower PMI
    val d = docs(
      (1L, "rare pair the end the cat the dog"),
      (2L, "rare pair the end the cat the dog"))
    val out = Collocations.pmiCollocations(d, minCount = 2L, k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val n = 16.0 // total tokens
    def pmi(c12: Long, c1: Long, c2: Long): Double =
      BigDecimal(math.log(n * c12 / (c1 * c2).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("rare pair") === ((2L, pmi(2, 2, 2))))
    assert(out("the end") === ((2L, pmi(2, 6, 2))))
    assert(out("rare pair")._2 > out("the end")._2,
      "PMI must rank the exclusive pair above the stopword pair")
  }

  test("the min-count floor drops one-off coincidences") {
    val d = docs(
      (1L, "alpha beta alpha beta"),
      (2L, "gamma delta"))
    val out = Collocations.pmiCollocations(d, minCount = 2L, k = 10)
      .collect().map(_.getString(0))
    assert(out.contains("alpha beta"))
    assert(!out.contains("gamma delta"), "count-1 bigram must not survive")
  }

  test("ties on rounded PMI break by bigram lexicographically") {
    // two pairs with identical statistics
    val d = docs((1L, "a b a b c d c d"))
    val out = Collocations.pmiCollocations(d, minCount = 2L, k = 10)
      .collect().map(_.getString(0)).toSeq
    val ab = out.indexOf("a b"); val cd = out.indexOf("c d")
    assert(ab >= 0 && cd >= 0 && ab < cd)
  }
}
