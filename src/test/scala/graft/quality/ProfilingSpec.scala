package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  val df = Seq(
    (Some(1L), Some("a"), Some(1L)),
    (Some(2L), None, Some(3L)),
    (None, None, Some(4L)))
    .toDF("id", "name", "score")

  test("nullProfile: one row, per-column null counts, single pass") {
    val r = Profiling.nullProfile(df).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 0L)
  }

  test("nullKeys / allNullRows") {
    assert(Profiling.nullKeys(df, Seq("id")).count() == 1)
    assert(Profiling.allNullRows(df).count() == 0)
    val withAllNull = df.union(Seq((Option.empty[Long], Option.empty[String],
      Option.empty[Long])).toDF("id", "name", "score"))
    assert(Profiling.allNullRows(withAllNull).count() == 1)
  }

  test("recomputeMismatch: derived column checked against inputs") {
    val d = Seq((1L, 2L, 3L), (1L, 2L, 4L)).toDF("a", "b", "derived")
    assert(Profiling.recomputeMismatch(d, "derived", Seq("a", "b")).count() == 1)
  }

  test("recomputeMismatch: NULL derived value is a mismatch, not a pass") {
    val d = Seq((Some(1L), Some(2L), Some(3L)), (Some(1L), Some(2L), None))
      .toDF("a", "b", "derived")
    assert(Profiling.recomputeMismatch(d, "derived", Seq("a", "b")).count() == 1)
  }

  test("summary: row count + key nulls + flatness in one row") {
    val r = Profiling.summary(df, Seq("id", "name")).collect().head
    assert(r.getAs[Long]("n_rows") == 3L)
    assert(r.getAs[Long]("null_id") == 1L)
    assert(r.getAs[Long]("null_name") == 2L)
    assert(r.getAs[String]("non_flat_columns") == "")
  }
}
