package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q213 — incremental near-dup pair-index maintenance. The laws:
  *
  *  1. maintained ≡ from-scratch on the union corpus (the IVM law),
  *     including when the batch pushes a shingle across the df cap and
  *     RETRACTS a base pair;
  *  2. the kept leg is carried from stored state, never recomputed
  *     (proven by poisoning the stored pairs);
  *  3. the leg split is what we claim: batch-adjacent and
  *     crossing-adjacent pairs are recomputed, the rest kept.
  */
class DedupMaintainSpec extends SparkSpec {

  import DedupMaintain.{maintainPairs, baseState, pairsFromShingles}

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** From-scratch recompute of the union — the oracle's side of the
    * law, in-process: capped shingles over the union, exact pairs.
    */
  private def fromScratch(base: DataFrame, batch: DataFrame, k: Int,
      maxDf: Int): DataFrame =
    pairsFromShingles(
      Dedup.cappedShingles(base.unionByName(batch), k, maxDf))

  private def pairSet(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select("id_a", "id_b", "n_common", "n_a", "n_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  test("maintained equals the from-scratch union recompute on the " +
    "driver corpus (both legs present at sf0.001 scale-down params)") {
    val all = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val base = all.filter(col("doc_id") % 7 =!= 6)
    val batch = all.filter(col("doc_id") % 7 === 6)
    val maintained = maintainPairs(base, batch, baseState(base, 3, 5), 3, 5)
    assert(pairSet(maintained) == pairSet(fromScratch(base, batch, 3, 5)))
  }

  test("a batch near-dup of a base doc lands in the recomputed leg; a " +
    "base-base pair away from the batch is kept") {
    // base pair (1, 2): identical text, far from the batch's vocabulary
    // batch doc 100 is a near-dup of base doc 3
    val base = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "red green blue cyan magenta yellow",
      4L -> "one two three four five six seven")
    val batch = docs(100L -> "red green blue cyan magenta white")
    val out = maintainPairs(base, batch, baseState(base, 3, 5), 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(5)))
    assert(out.contains((1L, 2L, "kept")), out.toSeq)
    assert(out.contains((3L, 100L, "recomputed")), out.toSeq)
    assert(pairSet(maintainPairs(base, batch, baseState(base, 3, 5), 3, 5))
      == pairSet(fromScratch(base, batch, 3, 5)))
  }

  test("df-cap retraction: the batch pushes a shared shingle across the " +
    "cap, the base pair is retracted — maintained still equals scratch") {
    // docs 1 and 2 pair ONLY through the shingle 'x y z' (their other
    // tokens differ); with maxDf = 2 the base df is exactly 2 (at cap)
    val base = docs(
      1L -> "x y z",
      2L -> "x y z")
    // the batch re-uses 'x y z' → union df = 3 > cap → the shingle is a
    // stop-shingle, docs 1/2 lose their ONLY shingle, the pair dies
    val batch = docs(100L -> "x y z q r s")
    val stored = baseState(base, 3, 2)
    assert(pairSet(stored) == Set((1L, 2L, 1L, 1L, 1L)),
      "precondition: the base pair exists in stored state")
    val maintained = maintainPairs(base, batch, stored, 3, 2)
    assert(pairSet(maintained) == pairSet(fromScratch(base, batch, 3, 2)))
    assert(maintained.count() == 0L,
      "the crossing retracts the only pair")
  }

  test("the kept leg is stored state, not a recompute: a poisoned " +
    "clean-clean row survives verbatim (the Ivm poison discipline)") {
    val base = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "red green blue cyan magenta yellow")
    val batch = docs(100L -> "red green blue cyan magenta white")
    import spark.implicits._
    // poison: the stored (1, 2) row carries an impossible n_common
    val poisoned = baseState(base, 3, 5)
      .filter(!(col("id_a") === 1L && col("id_b") === 2L))
      .unionByName(Seq((1L, 2L, 999L, 999L, 999L))
        .toDF("id_a", "id_b", "n_common", "n_a", "n_b"))
    val out = maintainPairs(base, batch, poisoned, 3, 5)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 999L,
      "the clean-clean pair must come from stored state untouched")
  }

  test("under-cap batch shingles do NOT dirty base docs: a base-base " +
    "pair sharing vocabulary with the batch stays kept while the df " +
    "stays under the cap") {
    // docs 1/2 pair through 'alpha beta gamma'; the batch ALSO contains
    // that shingle, but union df = 3 ≤ maxDf = 5 — no crossing, so 1/2
    // stay clean and the pair is kept (the batch doc itself pairs with
    // them through the recomputed leg)
    val base = docs(
      1L -> "alpha beta gamma p q",
      2L -> "alpha beta gamma r s")
    val batch = docs(100L -> "alpha beta gamma t u")
    val out = maintainPairs(base, batch, baseState(base, 3, 5), 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(5)))
    assert(out.contains((1L, 2L, "kept")), out.toSeq)
    assert(out.count(_._3 == "recomputed") == 2, out.toSeq)
    assert(pairSet(maintainPairs(base, batch, baseState(base, 3, 5), 3, 5))
      == pairSet(fromScratch(base, batch, 3, 5)))
  }

  test("fenced ingest: a crash-replayed pair-set advance is a no-op and " +
    "the committed table equals the maintained pair set") {
    import graft.stream.Ingest
    val all = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val base = all.filter(col("doc_id") % 7 =!= 6)
    val batch = all.filter(col("doc_id") % 7 === 6)
    val stored0 = baseState(base, 3, 5).localCheckpoint()
    val maintained = maintainPairs(base, batch, stored0, 3, 5)
      .localCheckpoint()
    val table = java.nio.file.Files
      .createTempDirectory("dedup-maintain").toString
    def advance(next: DataFrame, epoch: Long): String =
      Ingest.advanceSnapshotFenced(spark, table, epoch,
        next.limit(0)) { _ => next }
    val p0 = advance(stored0.withColumn("leg", lit("kept")), 0L)
    val p1 = advance(maintained, 1L)    // the ingest batch's epoch
    val p1again = advance(maintained, 1L) // at-least-once redelivery
    assert(p1again == p1, "fenced replay must return the committed path")
    val committed = spark.read.parquet(p1)
    assert(committed.exceptAll(maintained).count() == 0L, s"p0=$p0")
    assert(maintained.exceptAll(committed).count() == 0L)
  }

  test("the sf0.01 driver surface: kept and recomputed legs are both " +
    "non-empty and the union matches the from-scratch recompute") {
    val q = DedupMaintain.maintainQuery(spark, "/root/testdata/sf0.01")
    val legs = q.groupBy(col("leg")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(legs.getOrElse("kept", 0L) > 0, legs)
    assert(legs.getOrElse("recomputed", 0L) > 0, legs)
    val all = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val base = all.filter(col("doc_id") % 7 =!= 6)
    val batch = all.filter(col("doc_id") % 7 === 6)
    assert(pairSet(q) == pairSet(fromScratch(base, batch, 3, 5)))
  }
}
