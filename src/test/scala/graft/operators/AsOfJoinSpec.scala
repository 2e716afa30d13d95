package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0, "q1"),
    ("A", ts("2024-01-01 11:00:00"), 110.0, "q2"),
    ("A", ts("2024-01-01 12:00:00"), 120.0, "q3"),
    ("B", ts("2024-01-01 10:30:00"), 50.0, "q4"))
    .toDF("sym", "qts", "price", "qid")

  val trades = Seq(
    (1L, "A", ts("2024-01-01 10:30:00")), // between q1 and q2 → q1
    (2L, "A", ts("2024-01-01 11:00:00")), // exactly q2's ts → q2 (inclusive)
    (3L, "A", ts("2024-01-01 09:00:00")), // before all quotes → null
    (4L, "B", ts("2024-01-01 23:00:00")), // after B's only quote → q4
    (5L, "C", ts("2024-01-01 12:00:00"))) // key with no quotes → null
    .toDF("trade_id", "sym", "tts")

  test("backward as-of: latest at-or-before per key, null when none") {
    val out = AsOfJoin.backward(trades, quotes, "sym", "tts", "qts",
        Seq("price", "qid"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("qid"))).toMap
    assert(out(1L).contains("q1"))
    assert(out(2L).contains("q2")) // inclusive at equal timestamps
    assert(out(3L).isEmpty)
    assert(out(4L).contains("q4"))
    assert(out(5L).isEmpty)
  }

  test("null payload field does not tear rows (struct travels atomically)") {
    val q = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(100.0), "q1"),
      ("A", ts("2024-01-01 11:00:00"), None: Option[Double], "q2"))
      .toDF("sym", "qts", "price", "qid")
    val t = Seq((1L, "A", ts("2024-01-01 12:00:00"))).toDF("trade_id", "sym", "tts")
    val row = AsOfJoin.backward(t, q, "sym", "tts", "qts", Seq("price", "qid"))
      .collect().head
    // nearest row is q2 with a NULL price — price must be null, not q1's 100
    assert(row.getAs[String]("qid") == "q2")
    assert(row.isNullAt(row.fieldIndex("price")))
  }

  test("tolerance: stale reference rows are nulled out (merge_asof parity)") {
    // trade 4 is at 23:00 against sym B's only quote at 10:30 — 12.5h stale
    def withTol(tolMicros: Long) = AsOfJoin.backward(
      trades.filter(col("trade_id") === 4L), quotes, "sym", "tts", "qts",
      Seq("price", "qid"), tolerance = Some(tolMicros)).collect().head
    val staleMicros = (12 * 3600L + 30 * 60L) * 1000000L
    val tooTight = withTol(3600L * 1000000L) // 1h ≪ 12.5h
    assert(tooTight.isNullAt(tooTight.fieldIndex("qid")))
    // the bound is inclusive: age == tolerance keeps the match
    assert(withTol(staleMicros).getAs[String]("qid") == "q4")
    assert(withTol(staleMicros - 1).isNullAt(tooTight.fieldIndex("qid")))
  }

  test("null right timestamps never match (no -infinity leak)") {
    val q = Seq(
      ("A", null.asInstanceOf[Timestamp], 99.0, "qnull"),
      ("A", ts("2024-01-01 10:00:00"), 100.0, "q1"))
      .toDF("sym", "qts", "price", "qid")
    val t = Seq(
      (1L, "A", ts("2024-01-01 09:00:00")),  // before q1 → must be unmatched
      (2L, "A", ts("2024-01-01 11:00:00")))  // after q1 → q1
      .toDF("trade_id", "sym", "tts")
    val out = AsOfJoin.backward(t, q, "sym", "tts", "qts", Seq("qid"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("qid"))).toMap
    assert(out(1L).isEmpty) // NOT qnull
    assert(out(2L).contains("q1"))
  }

  test("right payload colliding with a left column fails fast") {
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, quotes.withColumnRenamed("qid", "trade_id"),
        "sym", "tts", "qts", Seq("trade_id"))
    }
  }

  test("plan: one shuffle total (union + keyed window sweep, no join)") {
    val df = AsOfJoin.backward(trades, quotes, "sym", "tts", "qts", Seq("price"))
    assert(Bucketing.numShuffles(df) == 1,
      df.queryExecution.executedPlan.toString)
  }
}
