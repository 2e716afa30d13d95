package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Sentiment

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  val texts = Seq(
    (1L, "Absolutely amazing, great food!"),
    (2L, "Terrible service, awful and dirty."),
    (3L, "the food was food"),
    (4L, null.asInstanceOf[String]),
    (5L, ""))
    .toDF("id", "text")

  test("expression agrees with the plain-Scala scorer on every row") {
    GraftFunctions.register(spark)
    val rows = texts
      .select(col("id"), col("text"), GraftFunctions.sentiment(col("text")).as("e"))
      .collect()
    rows.foreach { r =>
      val expected = Sentiment.compound(r.getString(1))
      assert(r.getFloat(2) == expected, s"row ${r.getLong(0)}")
    }
  }

  test("null text scores 0.0 (not NULL) — the reference's contract") {
    GraftFunctions.register(spark)
    val r = texts.filter(col("id") === 4L)
      .select(GraftFunctions.sentiment(col("text"))).collect().head
    assert(!r.isNullAt(0) && r.getFloat(0) == 0.0f)
  }

  test("fingerprint expression agrees with the composed-HOF fold and plain Scala") {
    GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val both = docs.select(col("doc_id"), col("text"),
      GraftFunctions.fingerprint(col("text")).as("expr_fp"),
      graft.text.TextOps.fingerprint(col("text")).as("hof_fp"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = r.getString(1).foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
      assert(r.getLong(2) == expected && r.getLong(3) == expected,
        s"doc ${r.getLong(0)}")
    }
  }

  test("callable from SQL, inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // parquet-backed so the projection isn't constant-folded into a
    // LocalTableScan (which would run the interpreted eval path instead)
    graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("sentiment_docs")
    val df = spark.sql(
      "SELECT doc_id, graft_sentiment(text) AS s FROM sentiment_docs WHERE doc_id < 20")
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [doc_id"), plan)
    val got = df.collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    // cross-check codegen output against the plain-Scala scorer
    val exp = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 20).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Sentiment.compound(r.getString(1))).toMap
    assert(got == exp)
  }
}
