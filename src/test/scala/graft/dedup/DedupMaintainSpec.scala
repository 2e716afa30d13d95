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

  test("persisted base state: the one-time build commits through the " +
    "snapshot protocol, maintenance READS the stored state (poison " +
    "proof), and a rewritten corpus invalidates it (fingerprint key)") {
    import graft.stream.Ingest
    import spark.implicits._
    val corpus = java.nio.file.Files
      .createTempDirectory("dedup-persist").toString
    // BatchMod = 7: doc 6 is the ingest batch, 1/2/3 the base; (1, 2)
    // pair away from the batch's vocabulary → clean, hence KEPT
    def write(rows: (Long, String)*): Unit =
      rows.toDF("doc_id", "text").repartition(1)
        .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    write(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "red green blue cyan magenta yellow",
      6L -> "red green blue cyan magenta white")
    val all = graft.Tables.documents(spark, corpus)
    val base = all.filter(col("doc_id") % 7 =!= 6)
    val batch = all.filter(col("doc_id") % 7 === 6)
    val q1 = DedupMaintain.maintainQuery(spark, corpus)
    assert(pairSet(q1) == pairSet(fromScratch(base, batch, 3, 5)))
    // the build committed a manifest-pointed snapshot
    val table = DedupMaintain.stateTablePath(spark, corpus)
    assert(new java.io.File(s"$table/_latest").exists(),
      s"no snapshot manifest at $table")
    // poison the STORED pair set: a second maintainQuery must surface
    // the poisoned kept row — proof it reads persisted state, not a
    // rebuild (the in-memory poison discipline, through parquet)
    Ingest.advanceSnapshot(spark, table,
      DedupMaintain.emptyState(spark)) { st =>
      st.filter(!(col("kind") === "pair" && col("id_a") === 1L))
        .unionByName(DedupMaintain.packState(
          Seq.empty[(Long, String)].toDF("doc_id", "shingle"),
          Seq.empty[(String, Long)].toDF("shingle", "n"),
          Seq((1L, 2L, 999L, 999L, 999L))
            .toDF("id_a", "id_b", "n_common", "n_a", "n_b")))
    }
    val q2 = DedupMaintain.maintainQuery(spark, corpus)
      .filter(col("id_a") === 1L && col("id_b") === 2L).collect()
    assert(q2.length == 1 && q2(0).getLong(2) == 999L
      && q2(0).getString(5) == "kept",
      s"poisoned stored pair must flow through the kept leg: ${q2.toSeq}")
    // REWRITE the corpus at the same path: the fingerprint key must
    // route to a fresh chain — the poisoned state is unreachable
    write(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",
      6L -> "unrelated words entirely here now")
    val all2 = graft.Tables.documents(spark, corpus)
    val q3 = DedupMaintain.maintainQuery(spark, corpus)
    assert(pairSet(q3) == pairSet(fromScratch(
      all2.filter(col("doc_id") % 7 =!= 6),
      all2.filter(col("doc_id") % 7 === 6), 3, 5)))
    assert(!q3.collect().exists(_.getLong(2) == 999L),
      "stale poisoned state served for a rewritten corpus")
  }

  test("streaming index maintenance: document batches drain exactly-" +
    "once into the fenced chain; after every drain the state pair set " +
    "equals the from-scratch recompute of everything ingested") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("dedup-stream").toString
    val in = s"$root/in"; val table = s"$root/state"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def drop(name: String, rows: (Long, String)*): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(in, name),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n"))
    def drain(): String = {
      val docs = spark.readStream
        .schema("doc_id LONG, text STRING").json(in)
      DedupMaintain.maintainStream(docs, table, ckpt)
        .getOrElse(sys.error("no committed snapshot"))
    }
    def scratch(rows: (Long, String)*): DataFrame =
      pairsFromShingles(Dedup.cappedShingles(
        rows.toDF("doc_id", "text"), DedupMaintain.K, DedupMaintain.MaxDf))
    val b1 = Seq(1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "red green blue cyan magenta yellow")
    drop("b1.json", b1: _*)
    val v1 = drain()
    assert(pairSet(DedupMaintain.pairsOf(spark.read.parquet(v1)))
      == pairSet(scratch(b1: _*)))
    // batch 2 both ADDS a near-dup of doc 3 and retracts nothing
    val b2 = Seq(100L -> "red green blue cyan magenta white")
    drop("b2.json", b2: _*)
    val v2 = drain()
    assert(v2 != v1)
    assert(pairSet(DedupMaintain.pairsOf(spark.read.parquet(v2)))
      == pairSet(scratch(b1 ++ b2: _*)))
    // exactly-once: a drain with nothing new leaves the state unchanged
    // (an empty micro-batch, if the source emits one, is a no-op
    // transition — same pairs, same index)
    val v3 = drain()
    assert(pairSet(DedupMaintain.pairsOf(spark.read.parquet(v3)))
      == pairSet(scratch(b1 ++ b2: _*)))
  }

  test("streaming CRUD maintenance: op-tagged batches (deletes applied " +
    "before inserts) drain through the fenced chain — after every " +
    "commit the state equals the from-scratch build of inserts-so-far " +
    "minus deletes-so-far, resurrection and in-batch update included") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("dedup-crud-stream").toString
    val in = s"$root/in"; val table = s"$root/state"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def drop(name: String, rows: (String, Long, String)*): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(in, name),
        rows.map { case (op, id, t) =>
          s"""{"op":"$op","doc_id":$id,"text":"$t"}"""
        }.mkString("\n"))
    def drain(): String = {
      val ops = spark.readStream
        .schema("op STRING, doc_id LONG, text STRING").json(in)
      DedupMaintain.maintainStreamCrud(ops, table, ckpt)
        .getOrElse(sys.error("no committed snapshot"))
    }
    def scratch(rows: (Long, String)*): DataFrame =
      pairsFromShingles(Dedup.cappedShingles(
        rows.toDF("doc_id", "text"), DedupMaintain.K, DedupMaintain.MaxDf))
    def statePairs(v: String) =
      pairSet(DedupMaintain.pairsOf(spark.read.parquet(v)))

    // batch 1: inserts only — 'x y z' in 3 docs > maxDf(5)? K=3, MaxDf=5
    // here, so no cap yet; docs 1/2 pair, 3 is unrelated
    val live = scala.collection.mutable.Map[Long, String]()
    def want() = scratch(live.toSeq.sortBy(_._1): _*)
    drop("b1.json",
      ("insert", 1L, "alpha beta gamma delta epsilon"),
      ("insert", 2L, "alpha beta gamma delta epsilon"),
      ("insert", 3L, "red green blue cyan magenta yellow"))
    live ++= Seq(1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "red green blue cyan magenta yellow")
    assert(statePairs(drain()) == pairSet(want()))

    // batch 2: a pure delete — doc 2 goes, the (1,2) pair with it
    drop("b2.json", ("delete", 2L, ""))
    live -= 2L
    assert(statePairs(drain()) == pairSet(want()))

    // batch 3: an in-batch UPDATE of doc 3 (delete + re-insert under
    // the same id with revised text) plus a fresh near-dup of it —
    // the retract lands before the insert reads the state
    drop("b3.json",
      ("delete", 3L, ""),
      ("insert", 3L, "red green blue cyan magenta violet"),
      ("insert", 4L, "red green blue cyan magenta indigo"))
    live += (3L -> "red green blue cyan magenta violet")
    live += (4L -> "red green blue cyan magenta indigo")
    assert(statePairs(drain()) == pairSet(want()))

    // batch 4: the streaming resurrection — first push the shared
    // prefix 'p q r s t' into 6 docs: its three trigrams all hit
    // df = 6 > maxDf(5) → stopped, each doc's capped set is its one
    // unique tail trigram, no pairs among them ...
    drop("b4.json", (10L to 15L).map(i =>
      ("insert", i, s"p q r s t tail$i")): _*)
    (10L to 15L).foreach(i => live += (i -> s"p q r s t tail$i"))
    val v4 = drain()
    assert(statePairs(v4) == pairSet(want()))
    // ... then delete two of them: the shared trigrams' df drops to
    // 4 ≤ 5 and the surviving quartet's common prefix comes back to
    // life (n_common 3 of 4 shingles per side → pairs resurrect)
    drop("b5.json", ("delete", 14L, ""), ("delete", 15L, ""))
    live --= Seq(14L, 15L)
    val v5 = drain()
    assert(statePairs(v5) == pairSet(want()))
    assert(statePairs(v5) != statePairs(v4),
      "the un-crossing delete must change the pair set (resurrection)")
    // and the df view tracks the survivors exactly (state, not pairs)
    val dfGot = DedupMaintain.dfOf(spark.read.parquet(v5)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfWant = Dedup.shingles(live.toSeq.toDF("doc_id", "text"),
        DedupMaintain.K).groupBy(col("shingle"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfGot == dfWant)
  }

  // -------------------------------------------------------------------
  // q215 — DELETION maintenance. The laws: maintained ≡ from-scratch of
  // corpus ∖ deleted; un-crossing df decrements RESURRECT pairs the
  // stored set never held; the kept leg is stored state, never
  // recomputed; insert ∘ delete composes (the update contract).
  // -------------------------------------------------------------------

  /** deleteCore over a from-scratch full state — the spec's delete
    * entry point (production reads the state from the snapshot chain).
    */
  private def deletePairs(all: DataFrame, delIds: Seq[Long], k: Int,
      maxDf: Int, storedPairs: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val st = DedupMaintain.buildState(all, k, maxDf)
    DedupMaintain.deleteCore(DedupMaintain.shOf(st),
      delIds.toDF("doc_id"),
      DedupMaintain.dfOf(st),
      storedPairs.getOrElse(DedupMaintain.pairsOf(st)), maxDf).pairs
  }

  test("deletion un-crosses a stop-shingle and RESURRECTS a pair the " +
    "stored set never held — maintained equals scratch over survivors") {
    // 'x y z' appears in 3 docs > maxDf = 2 → stopped; every other
    // shingle is unique → the stored pair set is EMPTY
    val all = docs(
      1L -> "x y z a b",
      2L -> "x y z c d",
      3L -> "x y z e f")
    val st = DedupMaintain.buildState(all, 3, 2)
    assert(pairSet(DedupMaintain.pairsOf(st)).isEmpty,
      "precondition: the stop-shingle suppresses every pair")
    // deleting doc 3 drops df('x y z') to 2 ≤ cap → docs 1/2 regain it:
    // n_common = 1, n_a = n_b = 3, 6·1 ≥ 6 → the pair is RESURRECTED
    val out = deletePairs(all, Seq(3L), 3, 2)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(rows.toSeq == Seq((1L, 2L, 1L, 3L, 3L, "recomputed")), rows.toSeq)
    assert(pairSet(out) == pairSet(pairsFromShingles(
      Dedup.cappedShingles(all.filter(col("doc_id") =!= 3L), 3, 2))))
  }

  test("a stored pair touching a deleted doc is dropped; the surviving " +
    "partner's OTHER pairs stay kept (the partner is not dirty)") {
    val all = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "alpha beta gamma delta zeta")
    // stored: (1,2), (1,3), (2,3); delete 3 → its pairs go, (1,2) stays
    val out = deletePairs(all, Seq(3L), 3, 5)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(5)))
    assert(rows.toSeq == Seq((1L, 2L, "kept")), rows.toSeq)
  }

  test("the delete kept leg is stored state, not a recompute: a " +
    "poisoned clean-clean row survives verbatim") {
    import spark.implicits._
    val all = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "red green blue cyan magenta yellow")
    val st = DedupMaintain.buildState(all, 3, 5)
    val poisoned = DedupMaintain.pairsOf(st)
      .filter(!(col("id_a") === 1L && col("id_b") === 2L))
      .unionByName(Seq((1L, 2L, 999L, 999L, 999L))
        .toDF("id_a", "id_b", "n_common", "n_a", "n_b"))
    val out = deletePairs(all, Seq(3L), 3, 5, Some(poisoned)).collect()
    assert(out.length == 1 && out(0).getLong(2) == 999L
      && out(0).getString(5) == "kept",
      s"poisoned stored pair must flow through the kept leg: ${out.toSeq}")
  }

  test("deleteState ∘ nextState closes the update contract: retract " +
    "old rows, insert new ones, state equals the from-scratch rebuild") {
    import spark.implicits._
    val a = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "red green blue cyan magenta yellow")
    val st0 = DedupMaintain.buildState(a, 3, 5).localCheckpoint()
    // UPDATE doc 2: retract the old row, insert the revised text under
    // the same doc_id — legal because the retract removed it from state
    val st1 = DedupMaintain.deleteState(st0, Seq(2L).toDF("doc_id"), 5)
      .localCheckpoint()
    assert(pairSet(DedupMaintain.pairsOf(st1)) == pairSet(
      pairsFromShingles(Dedup.cappedShingles(
        a.filter(col("doc_id") =!= 2L), 3, 5))))
    val revised = docs(2L -> "red green blue cyan magenta violet")
    val st2 = DedupMaintain.nextState(st1, revised, 3, 5)
    val want = a.filter(col("doc_id") =!= 2L).unionByName(revised)
    assert(pairSet(DedupMaintain.pairsOf(st2)) == pairSet(
      pairsFromShingles(Dedup.cappedShingles(want, 3, 5))))
    // the df view survives the round-trip too (state, not just pairs)
    val dfGot = DedupMaintain.dfOf(st2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfWant = Dedup.shingles(want, 3).groupBy(col("shingle"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfGot == dfWant)
  }

  test("the q215 driver surface: both legs present at sf0.001, the " +
    "union matches the from-scratch recompute of the survivors, and " +
    "the persisted full state commits a manifest-pointed snapshot") {
    val dir = "/root/testdata/sf0.001"
    val q = DedupMaintain.deleteQuery(spark, dir)
    val legs = q.groupBy(col("leg")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(legs.getOrElse("kept", 0L) > 0, legs)
    assert(legs.getOrElse("recomputed", 0L) > 0, legs)
    val all = graft.Tables.documents(spark, dir)
    val surv = all.filter(col("doc_id") % 9 =!= 8)
    assert(pairSet(q) == pairSet(pairsFromShingles(
      Dedup.cappedShingles(surv, 3, 5))))
    val table = DedupMaintain.fullStateTablePath(spark, dir)
    assert(new java.io.File(s"$table/_latest").exists(),
      s"no snapshot manifest at $table")
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
