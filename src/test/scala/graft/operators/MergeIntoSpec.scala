package graft.operators

import graft.SparkSpec

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def base(rows: (Long, Double)*) = rows.toDF("k", "p")
  private def changes(rows: (Long, Double, String)*) =
    rows.toDF("k", "p", "action")

  test("all five MERGE outcomes in one batch") {
    val b = base((1L, 10.0), (2L, 20.0), (3L, 30.0))
    val c = changes(
      (2L, 22.0, "upsert"),   // matched update
      (3L, 0.0, "delete"),    // matched delete
      (4L, 40.0, "upsert"),   // unmatched insert
      (5L, 0.0, "delete"))    // unmatched delete -> no-op
    val out = MergeInto.merge(b, c, "k", Seq("p")).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(out === Map(
      1L -> ((10.0, "kept")),
      2L -> ((22.0, "updated")),
      4L -> ((40.0, "inserted"))))
  }

  test("merge is idempotent for upserts: re-applying changes is a no-op") {
    val b = base((1L, 10.0), (2L, 20.0))
    val c = changes((2L, 25.0, "upsert"), (3L, 30.0, "upsert"))
    val once = MergeInto.merge(b, c, "k", Seq("p"))
      .select("k", "p").orderBy("k")
    val twice = MergeInto.merge(once, c, "k", Seq("p"))
      .select("k", "p").orderBy("k")
    assert(once.collect().toSeq === twice.collect().toSeq)
  }

  test("unrecognized and null actions RAISE instead of silently deleting") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString)
        .mkString(" | ")
    // a typo'd action ("update") on a matched row used to fall through the
    // CASE to delete — silent row loss on a durable write path
    val typo = intercept[Throwable] {
      MergeInto.merge(base((1L, 10.0)), changes((1L, 11.0, "update")),
        "k", Seq("p")).collect()
    }
    assert(chain(typo).contains("unrecognized action"), chain(typo))
    // a null action on an UNMATCHED row used to silently drop the insert
    val nul = intercept[Throwable] {
      MergeInto.merge(base((1L, 10.0)),
        Seq((2L, 20.0, null.asInstanceOf[String])).toDF("k", "p", "action"),
        "k", Seq("p")).collect()
    }
    assert(chain(nul).contains("unrecognized action"), chain(nul))
  }

  test("multi-column payload: the change side wins every payload column") {
    val b = Seq((1L, 10.0, "x")).toDF("k", "p", "tag")
    val c = Seq((1L, 11.0, "y", "upsert")).toDF("k", "p", "tag", "action")
    val r = MergeInto.merge(b, c, "k", Seq("p", "tag")).collect().head
    assert(r.getDouble(1) === 11.0 && r.getString(2) === "y")
    assert(r.getString(3) === "updated")
  }
}
