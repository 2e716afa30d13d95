package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental view maintenance over partial-aggregate state — the
  * Z-set/delta model of classic IVM [Gupta & Mumick, "Maintenance of
  * materialized views: problems, techniques, and applications", IEEE
  * DE Bull. 18(2); the algebra DBSP (Budiu et al., VLDB'23) formalizes]:
  * a change batch is rows with a SIGN (+1 insert, −1 delete; an update
  * is a −1/+1 pair), and maintaining a grouped sum/count view is just
  * aggregating the signed deltas and ADDING them to the stored partial
  * state — never re-touching the base facts. Groups whose maintained
  * count reaches zero are eliminated (the Z-set zero-weight rule).
  *
  * At 100 TB this is the only affordable shape for a continuously
  * maintained aggregate: the delta batch is exchange-keyed like any
  * aggregation, the stored view is view-sized, and the base table is
  * read exactly once in its lifetime. Avg-style views derive from the
  * maintained (sum, count) pair rather than being maintained directly
  * (avg is not a homomorphism; sum/count are).
  */
object Ivm {

  /** Merge a signed delta into a (key, n, total) view: new state =
    * state ⊕ aggregated deltas, zero-count groups eliminated.
    *
    * PRECONDITION: the delta must be consistent with the view — a delete
    * (sign −1) must refer to a row the view's count actually contains, so
    * no maintained count can go below zero. A negative maintained count is
    * not a Z-set state; it means the caller fed a delete for a row the
    * view never absorbed (a torn batch, a replayed delete, an upstream
    * bug). Folding such groups into zero-elimination would silently mask
    * the corruption, so instead the merge RAISES on the first negative
    * group (distributed-side `raise_error`, no driver collect). Callers
    * that expect dirty deltas should pre-screen them through the
    * quarantine path (`etl.Quarantine`) rather than suppress the check.
    */
  def maintain(view: DataFrame, delta: DataFrame): DataFrame = {
    val d = delta.groupBy(col("key"))
      .agg(sum(col("sign")).cast("long").as("n"),
        sum(col("sign") * col("value")).as("total"))
    view.select(col("key"), col("n"), col("total"))
      .unionByName(d)
      .groupBy(col("key"))
      .agg(sum(col("n")).cast("long").as("n"), sum(col("total")).as("total"))
      .withColumn("n",
        when(col("n") < 0, raise_error(concat(
          lit("Ivm.maintain: maintained count went negative for key "),
          col("key").cast("string"),
          lit(" — delta deletes a row the view never contained"))))
          .otherwise(col("n")))
      .filter(col("n") > 0)
  }

  /** MIN/MAX CONTRACT. Extremum views are NOT Z-set-expressible: the
    * stored min carries no second-smallest, so a delta that retracts the
    * current minimum cannot be absorbed from (key, n, vmin) state alone —
    * the classic non-distributive-aggregate gap of IVM [Gupta & Mumick
    * §4]. [[maintain]] therefore refuses min/max by construction (its
    * state is (n, total)); [[maintainMin]]/[[maintainMax]] are the
    * explicit fallback legs (one shared direction-flipped core):
    * inserts and extremum-preserving deletes merge incrementally, and
    * ONLY the groups whose delta retracts their stored extremum are
    * rebuilt from the base facts — a semi-join-pruned,
    * affected-groups-only scan, not a view rebuild.
    *
    * 100 TB shape: the incremental path is delta ⊕ view exactly like
    * [[maintain]]; the fallback path reads base restricted to the dirty
    * key set (broadcast/DPP-prunable — dirty keys are a delta-bounded
    * set, typically a sliver of the view). The worst case (every delta
    * row deletes a group minimum) degrades to base-scan-per-batch, which
    * is the honest lower bound for an extremum under retraction; callers
    * with that delta shape should maintain a per-group ordered buffer
    * instead (out of scope here — document, don't pretend).
    *
    * Consistency discipline mirrors [[maintain]]: a delete below the
    * stored minimum, or against a group the view doesn't contain, is
    * corruption — RAISE distributed-side, never fold into the rebuild.
    *
    * @param view  maintained state (key, n, vmin)
    * @param delta signed rows (key, sign, value)
    * @param base  the POST-delta base facts (key, value) — the snapshot
    *              the delta has already been applied to, read only for
    *              groups whose minimum was retracted
    */
  def maintainMin(view: DataFrame, delta: DataFrame,
                  base: DataFrame): DataFrame =
    maintainExtremum(view, delta, base, isMin = true)

  /** The MAX mirror of [[maintainMin]]: maintained state (key, n, vmax),
    * inserts and max-preserving deletes merge incrementally, a delta
    * retracting the stored maximum rebuilds that group from the
    * post-delta base, a delete ABOVE the maintained maximum raises.
    * Same fallback economics, same corruption discipline — one shared
    * core, direction-flipped comparators.
    */
  def maintainMax(view: DataFrame, delta: DataFrame,
                  base: DataFrame): DataFrame =
    maintainExtremum(view, delta, base, isMin = false)

  /** The shared extremum-maintenance core — min and max are the same
    * algorithm under a flipped order: "beyond the stored extremum" is
    * corruption, "equal to it with sign −1" dirties the group,
    * inserts fold with least/greatest, dirty groups rebuild from base.
    */
  private def maintainExtremum(view: DataFrame, delta: DataFrame,
                               base: DataFrame, isMin: Boolean): DataFrame = {
    val vc = if (isMin) "vmin" else "vmax"
    val fn = if (isMin) "Ivm.maintainMin" else "Ivm.maintainMax"
    val sideMsg = if (isMin) "delete below the maintained minimum for "
                  else "delete above the maintained maximum for "
    def beyond(value: Column, ext: Column): Column =
      if (isMin) value < ext else value > ext
    def insFold(c: Column): Column = if (isMin) min(c) else max(c)
    def combine(a: Column, b: Column): Column =
      if (isMin) least(a, b) else greatest(a, b)
    val v = view.select(col("key"), col("n"), col(vc))
    val d = delta
      .join(v.select(col("key"), col(vc)), Seq("key"), "left")
      .withColumn("bad",
        col("sign") < 0
          && (col(vc).isNull || beyond(col("value"), col(vc))))
      .groupBy(col("key"))
      .agg(sum(col("sign")).cast("long").as("dn"),
        insFold(when(col("sign") > 0, col("value"))).as("ins_ext"),
        max(col("sign") < 0 && col("value") === col(vc)).as("dirty"),
        max(col("bad")).as("bad"))
      .withColumn("dn",
        when(col("bad"), raise_error(concat(
          lit(s"$fn: $sideMsg"),
          lit("key "), col("key").cast("string"),
          lit(" — the view never contained that row"))))
          .otherwise(col("dn")))
    val merged = v.join(d, Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        combine(col(vc), col("ins_ext")).as("inc_ext"),
        coalesce(col("dirty"), lit(false)).as("dirty"))
      .withColumn("n",
        when(col("n") < 0, raise_error(concat(
          lit(s"$fn: maintained count went negative for key "),
          col("key").cast("string"))))
          .otherwise(col("n")))
      .filter(col("n") > 0)
    // the fallback leg: rebuild ONLY the retracted-extremum groups from
    // the post-delta base (semi-join-pruned; survivors stay incremental)
    val dirtyKeys = merged.filter(col("dirty")).select(col("key"))
    val rebuilt = base.join(dirtyKeys, Seq("key"), "left_semi")
      .groupBy(col("key"))
      .agg((if (isMin) min(col("value")) else max(col("value"))).as("rb_ext"))
    merged.join(rebuilt, Seq("key"), "left")
      .select(col("key"), col("n"),
        when(col("dirty"), col("rb_ext")).otherwise(col("inc_ext"))
          .as(vc))
  }

  /** A continuously-maintained view: the Z-set merge COMPOSED with the
    * versioned-snapshot commit protocol ([[graft.stream.Ingest
    * .advanceSnapshot]]) — each signed delta batch reads the latest
    * committed view state, merges through [[maintain]], and commits the
    * next version manifest-last. The lifecycle this buys at 100 TB: the
    * base facts are read once ever; every subsequent commit costs
    * O(|delta| + |view|), survives writer crashes (torn versions are
    * invisible and their numbers re-used), and `vacuumSnapshots` bounds
    * storage. IvmSpec's multi-batch case asserts maintained ≡ rebuilt
    * after EVERY commit, through crash debris.
    *
    * Returns the committed snapshot path; read the view back from it.
    */
  def maintainChain(s: SparkSession, tablePath: String,
                    delta: DataFrame): String =
    graft.stream.Ingest.advanceSnapshot(s, tablePath,
      delta.select(col("key"), lit(0L).as("n"),
        (col("value") * lit(0.0)).as("total")).limit(0)) {
      base => maintain(base, delta)
    }

  /** The STREAMING leg of the maintained view: a stream of signed
    * deltas (key, sign, value) drains through foreachBatch into the
    * fenced snapshot chain — each micro-batch commits exactly once even
    * under at-least-once redelivery, because the batchId rides the
    * manifest's atomic PUT as the fencing epoch
    * ([[graft.stream.Ingest.advanceSnapshotFenced]]). This is the
    * composition that kills the batch/streaming split for aggregates at
    * 100 TB: the facts stream in as deltas, the view is always
    * view-sized, and a crash anywhere replays into a no-op instead of a
    * double-count (MERGE upserts converge under replay by idempotence;
    * signed deltas MUST be fenced — they accumulate).
    *
    * Contract (inherited from the fence): one writer, one checkpoint
    * lineage per table. Returns the latest committed snapshot path.
    */
  def maintainStream(deltas: DataFrame, tablePath: String,
                     checkpoint: String): Option[String] = {
    val spark = deltas.sparkSession
    val q = deltas.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) =>
          graft.stream.Ingest.advanceSnapshotFenced(spark, tablePath, id,
            batch.toDF().select(col("key"), lit(0L).as("n"),
              (col("value") * lit(0.0)).as("total")).limit(0)) {
            base => maintain(base, batch.toDF())
          }
          ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.stream.Ingest.latestSnapshotPath(spark, tablePath)
  }

  /** q152: per-customer order count/spend maintained through a
    * deterministic change batch — base view = orders with key % 10 ≠ 0;
    * delta inserts the % 10 = 0 rows and deletes the % 7 = 0 rows the
    * base contains. Output: the maintained view with the derived avg,
    * which RecomputeSpec-style assertion in IvmSpec proves equal to a
    * from-scratch rebuild of the post-delta world.
    */
  def ivmQuery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey").as("key"), col("o_orderkey").as("okey"),
        col("o_totalprice").as("value"))
    val view = o.filter(col("okey") % 10 =!= 0)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    val inserts = o.filter(col("okey") % 10 === 0)
      .select(col("key"), lit(1L).as("sign"), col("value"))
    val deletes = o.filter(col("okey") % 10 =!= 0 && col("okey") % 7 === 0)
      .select(col("key"), lit(-1L).as("sign"), col("value"))
    // avg derives from the ROUNDED total (bit-identical on both engines
    // since total_spend hash-matches) and reports SIX decimals, not two:
    // a 2-dp total divided by a small even n lands EXACTLY on half-cent
    // boundaries (….785), where Spark's BigDecimal HALF_UP and DuckDB's
    // rint(x·100)/100 disagree — measured, 10 rows at sf0.01. At 6 dp
    // every terminating quotient (n = 2^a·5^b ≤ 16 ⇒ ≤ 6 decimal
    // digits) is EXACT, so no value sits on a rounding boundary.
    maintain(view, inserts.unionByName(deletes))
      .select(col("key").as("o_custkey"), col("n").as("n_orders"),
        round(col("total"), 2).as("total_spend"),
        round(round(col("total"), 2) / col("n"), 6).as("avg_spend"))
      .orderBy(col("o_custkey"))
  }
}
