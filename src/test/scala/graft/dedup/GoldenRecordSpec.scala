package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("rid", "email", "phone", "name", "acctbal",
    "mktsegment", "version")

  test("transitive chain A-email-B-phone-C merges into ONE golden row " +
    "even though A and C share nothing directly") {
    val recs = Seq(
      (1L, "e1", "p1", "Ann", Some(10.0), "AUTO", 1L),
      (2L, "e1", "p9", "ANN", None, "AUTO", 2L),        // email-linked to 1
      (3L, "e9", "p9", "Ann JR", Some(15.0), "STEEL", 3L)) // phone-linked to 2
      .toDF(cols: _*)
    val got = GoldenRecord.golden(recs).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("cluster_id") == 1L)
    assert(r.getAs[Long]("n_records") == 3L)
    assert(r.getAs[String]("name") == "Ann JR", "recency rule: version 3 wins")
    assert(r.getAs[Double]("acctbal") == 15.0)
    assert(r.getAs[String]("mktsegment") == "AUTO", "2-of-3 consensus")
  }

  test("presence rule: a newer record's NULL must not erase an older " +
    "known balance, while its newer name DOES win") {
    val recs = Seq(
      (10L, "e2", "p2", "Bob", Some(42.5), "FURN", 1L),
      (11L, "e2", "p8", "BOB", None, "FURN", 2L))
      .toDF(cols: _*)
    val r = GoldenRecord.golden(recs).collect()(0)
    assert(r.getAs[String]("name") == "BOB")
    assert(r.getAs[Double]("acctbal") == 42.5,
      "most recent NON-NULL, not most recent")
  }

  test("frequency rule ties break to the lexicographically smallest " +
    "segment; singletons pass through unmerged") {
    val recs = Seq(
      (20L, "e3", "p3", "Cy", Some(1.0), "STEEL", 1L),
      (21L, "e3", "p3", "Cy", Some(1.0), "AUTO", 2L), // 1-1 tie: AUTO wins
      (30L, "e4", "p4", "Dee", Some(2.0), "HOUSE", 1L))
    val got = GoldenRecord.golden(recs.toDF(cols: _*)).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_records"), r.getAs[String]("mktsegment"))).toMap
    assert(got(20L) == (2L, "AUTO"))
    assert(got(30L) == (1L, "HOUSE"), "singleton keeps its own attributes")
  }

  test("q164 on the real corpus: cluster sizes follow the %3/%6 " +
    "construction and every golden row obeys all three rules against a " +
    "brute-force per-cluster recompute") {
    val dir = "/root/testdata/sf0.001"
    val recs = GoldenRecord.dirtyRegistry(spark, dir).collect().map { r =>
      (r.getAs[Long]("rid"), r.getAs[String]("email"),
        r.getAs[String]("phone"), r.getAs[String]("name"),
        Option(r.getAs[java.lang.Double]("acctbal")).map(_.doubleValue),
        r.getAs[String]("mktsegment"), r.getAs[Long]("version"))
    }
    val got = GoldenRecord.goldenQuery(spark, dir).collect()
    // brute force: group records by entity (rid / 4 — the construction)
    val byEntity = recs.groupBy(_._1 / 4L)
    assert(got.length == byEntity.size)
    val gotBy = got.map(r => r.getAs[Long]("cluster_id") -> r).toMap
    for ((k, rs) <- byEntity) {
      val cid = rs.map(_._1).min
      val g = gotBy(cid)
      assert(g.getAs[Long]("n_records") == rs.length.toLong)
      assert(g.getAs[String]("name") == rs.maxBy(_._7)._4)
      val nonNull = rs.filter(_._5.isDefined)
      assert(g.getAs[Double]("acctbal") == nonNull.maxBy(_._7)._5.get)
      val seg = rs.groupBy(_._6).toSeq
        .minBy { case (v, xs) => (-xs.length, v) }._1
      assert(g.getAs[String]("mktsegment") == seg)
      val expSize = if (k % 6L == 0L) 3 else if (k % 3L == 0L) 2 else 1
      assert(rs.length == expSize)
    }
  }
}
