package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequenceMatchSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_id", "t")

  test("sequence strings order by timestamp with id tie-break") {
    val d = ev((1L, 5L, 2L, "b"), (1L, 5L, 1L, "a"), (1L, 3L, 9L, "z"),
      (2L, 1L, 1L, "x"))
    val out = SequenceMatch.sequenceStrings(d, "user_id", "ts", "event_id",
        col("t")).orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "zab"), (2L, "x")))
  }

  test("patternCounts: keys-matching vs total non-overlapping matches") {
    val seqs = Seq((1L, "vvcp"), (2L, "vcpvcp"), (3L, "ppp"), (4L, "vc"))
      .toDF("user_id", "seq")
    val out = SequenceMatch.patternCounts(seqs, Seq("buy" -> "v+c+p"))
      .collect()(0)
    assert(out.getString(0) == "buy")
    assert(out.getLong(1) == 2L) // users 1 and 2
    assert(out.getLong(2) == 3L) // user 2 matches twice
  }

  test("patterns stack without changing each other's counts") {
    val seqs = Seq((1L, "spev"), (2L, "evve")).toDF("user_id", "seq")
    val out = SequenceMatch.patternCounts(seqs,
        Seq("a" -> "sp", "b" -> "e[vc]*e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 1L, 1L), ("b", 1L, 1L)))
  }
}
