package graft.text

import org.apache.spark.sql.Row
import graft.SparkSpec

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  // 26 tokens, all distinct, avg token length ≈ 4.8, contains the/a/and
  private val goodDoc =
    "the quick brown fox jumps over a lazy dog and every active rabbit " +
    "climbs tall green trees while seven hungry birds watch quietly from " +
    "distant branches"

  test("each rule fires on its designed violation and only there") {
    val d = docs(
      (1L, "s", goodDoc),                                // passes everything
      (2L, "s", "the cat and dog"),                      // too short
      (3L, "s", ("a b c d " * 10).trim + " the and"),    // avg token len < 3
      (4L, "s", ("spark " * 40).trim + " the and of"),   // diversity + top-token
      (5L, "s", "alpha bravo charlie delta echo foxtrot golf hotel india " +
                "juliet kilo lima mike november oscar papa quebec romeo " +
                "sierra tango uniform victor whiskey xray yankee zulu " +
                "one two three four")                    // no stopword marker
    )
    val f = QualityRules.qualityFlags(d)
      .select("doc_id", "fail_len", "fail_word_len", "fail_diversity",
        "fail_top_token", "fail_stop", "pass")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(f(1L) === Row(1L, false, false, false, false, false, true))
    assert(f(2L).getBoolean(1), "doc 2 should fail the length rule")
    assert(f(3L).getBoolean(2), "doc 3 should fail the mean-word-length rule")
    assert(f(4L).getBoolean(3) && f(4L).getBoolean(4),
      "doc 4 should fail diversity and top-token concentration")
    assert(f(5L).getBoolean(5), "doc 5 should fail the stopword rule")
    assert(!f(2L).getBoolean(6) && !f(5L).getBoolean(6))
  }

  test("top_token_ratio equals the true mode frequency over count") {
    val d = docs((1L, "s", "b a c a b a"))
    val r = QualityRules.qualityFlags(d).select("top_token_ratio").head()
    assert(r.getDouble(0) === 0.5) // 'a' appears 3/6
  }

  test("zero-token docs count in n_docs and fail (never dropped)") {
    // the oracle's md join is LEFT for exactly this row shape: a document
    // with no tokens has no per-token counts but must still be gated
    val d = docs((1L, "s", goodDoc), (2L, "s", ""), (3L, "s", "   "))
    val f = QualityRules.qualityFlags(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f.size === 3)
    Seq(2L, 3L).foreach { id =>
      assert(f(id).getAs[Long]("n_tokens") === 0L)
      assert(f(id).getAs[Double]("top_token_ratio") === 0.0)
      assert(f(id).getAs[Boolean]("fail_len") && !f(id).getAs[Boolean]("pass"))
    }
    val sm = QualityRules.qualitySummary(d).collect().head
    assert(sm.getAs[Long]("n_docs") === 3L)
  }

  test("summary counts partition the corpus per source") {
    val d = docs(
      (1L, "s1", goodDoc),
      (2L, "s1", "the cat"),
      (3L, "s2", "und der das die"))
    val sm = QualityRules.qualitySummary(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(sm("s1").getLong(1) === 2L)       // n_docs
    assert(sm("s1").getLong(2) === 1L)       // n_fail_len (doc 2)
    assert(sm("s2").getLong(2) === 1L)       // doc 3 too short
    assert(sm("s1").getLong(7) === 1L)       // n_pass (doc 1)
  }
}
