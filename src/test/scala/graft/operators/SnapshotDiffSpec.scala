package graft.operators

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val neu = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val out = SnapshotDiff.diff(old, neu, "k", Seq("s", "v"))
      .select("k", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("null payload fields compare null-safely, not as changed") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "s")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val out = SnapshotDiff.diff(old, neu, "k", Seq("s"))
      .select("k", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("columns outside the payload do not trigger changed") {
    val old = Seq((1L, "keep", "ignore-old")).toDF("k", "s", "noise")
    val neu = Seq((1L, "keep", "ignore-new")).toDF("k", "s", "noise")
    val out = SnapshotDiff.diff(old, neu, "k", Seq("s")).collect()
    assert(out(0).getAs[String]("status") == "unchanged")
  }
}
