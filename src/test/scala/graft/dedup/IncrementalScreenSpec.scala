package graft.dedup

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Tier semantics of the incremental batch-vs-corpus admission screen:
  * exact copies flagged by tier 1, near-copies by containment, novel rows
  * admitted.
  */
class IncrementalScreenSpec extends SparkSpec {

  private val textA = "the quick brown fox jumps over the lazy dog today"
  private val textB = "pack my box with five dozen brown liquor jugs now"
  private val novel = "completely different words about distributed query engines and planning"

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact copies, near copies, and novel rows screen correctly") {
    val corpus = docs(1L -> textA, 2L -> textB)
    // 10 = verbatim copy of A; 11 = A with the last word changed (high
    // containment, not exact); 12 = novel
    val nearA = textA.split(" ").dropRight(1).mkString(" ") + " tonight"
    val batch = docs(10L -> textA, 11L -> nearA, 12L -> novel)
    val out = Dedup.screenBatch(corpus, batch, k = 5, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(10L)._1, "verbatim copy must hit the exact tier")
    assert(!out(10L)._3, "verbatim copy must not be admitted")
    assert(!out(11L)._1, "near copy is not an exact dup")
    assert(out(11L)._2 >= 0.5, s"near copy containment too low: ${out(11L)._2}")
    assert(!out(11L)._3, "near copy must not be admitted")
    assert(!out(12L)._1 && out(12L)._2 < 0.5 && out(12L)._3,
      "novel row must be admitted")
  }

  test("short batch rows (< k tokens) carry zero containment but still hit the exact tier") {
    val corpus = docs(1L -> textA, 2L -> "tiny doc")
    val batch = docs(10L -> "tiny doc", 11L -> "other short")
    val out = Dedup.screenBatch(corpus, batch, k = 5, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(10L) == ((true, 0.0, false)))
    assert(out(11L) == ((false, 0.0, true)))
  }
}
