package graft.text

import graft.SparkSpec

/** TextRank contracts on hand corpora: the candidate filter, the
  * co-occurrence graph, symmetry of ranks under symmetric graph
  * positions, and the probability-mass invariant.
  */
class TextRankSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("candidate filter: short, numeric, and punctuated tokens drop; " +
    "case folds AFTER the filter") {
    val e = TextRank.cooccurrenceEdges(
      Seq("The cat, sat 12 Times cat").toDF("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // candidates: the, sat, times, cat (adjacent pairs only)
    assert(e === Set(("sat", "the"), ("sat", "times"), ("cat", "times")))
  }

  test("repeated adjacent words are not self-loops and duplicate pairs " +
    "collapse") {
    val e = TextRank.cooccurrenceEdges(
      Seq("foo foo bar", "bar foo").toDF("text")).collect()
    assert(e.length === 1)
    assert((e(0).getString(0), e(0).getString(1)) === ("bar", "foo"))
  }

  test("symmetric path graph: end words tie, middle words tie and " +
    "outrank the ends; ranks sum to 1") {
    // alpha-beta-gamma-delta: a path in co-occurrence space
    val out = TextRank.keywords(
        Seq("alpha beta gamma delta").toDF("text"), k = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("alpha") === out("delta"))
    assert(out("beta") === out("gamma"))
    assert(out("beta") > out("alpha"))
    assert(math.abs(out.values.sum - 1.0) < 1e-6)
  }

  test("q178 on testdata: 20 rows, rank-descending, tie-broken on word") {
    val rows = TextRank.textrankQuery(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.length === 20)
    assert(rows.sliding(2).forall { case Array((w1, r1), (w2, r2)) =>
      r1 > r2 || (r1 == r2 && w1 < w2) })
  }
}
