package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Type-2 slowly-changing-dimension history — the dimension-lifecycle
  * operator every warehouse ETL ships [Kimball & Ross, "The Data
  * Warehouse Toolkit", ch. 5: SCD type 2]: given a SEQUENCE of dimension
  * snapshots, produce one row per (key, unchanged-payload run) with
  * `[valid_from, valid_to)` version validity and an `is_current` flag —
  * handling payload changes, deletions (key absent from a snapshot
  * closes its run) and reappearances (a new run opens). The inverse
  * operator, [[asOf]], reconstructs any historical snapshot from the
  * history by validity-interval filter — the "time travel" read path —
  * and Scd2Spec asserts reconstruct(v) ≡ snapshot(v) for EVERY version,
  * which is the pair's defining round-trip law.
  *
  * Reference tie: the reference's overwrite-refresh dimension tables
  * (`README.md` batch refresh discussion) keep only the latest state;
  * SCD2 is what that pipeline grows into the moment "what did this
  * dimension say when the fact landed" becomes a question.
  *
  * 100 TB shape: ONE exchange on the dimension key; the change-detection
  * window orders ≤ |versions| rows per key (version count is small by
  * definition — it is the number of refresh runs), and the run-collapse
  * is a grouped aggregate riding the same key distribution. No corpus
  * window, no join. The as-of read is a filter — at scale you partition
  * the stored history by `is_current` first so the hot "current
  * dimension" read never touches closed rows.
  */
object Scd2 {

  /** Collapse stacked snapshots `(version, key, payload...)` into SCD2
    * history rows `(key, payload..., valid_from, valid_to, is_current)`.
    *
    * A history row covers versions `[valid_from, valid_to)`; `valid_to`
    * is null on rows alive at `maxVersion` (and only those —
    * `is_current` is its null test). A run breaks when the payload
    * changes (null-safe struct compare) OR the key skips a version
    * (deletion; a later reappearance opens a fresh run).
    *
    * @param maxVersion the newest version present in `snaps` — passed
    *                   explicitly (not derived by a scan) because the
    *                   caller's snapshot registry knows it.
    */
  def buildHistory(snaps: DataFrame, key: String, payload: Seq[String],
                   maxVersion: Long): DataFrame = {
    val p: Column = struct(payload.map(col): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("version"))
    val marked = snaps
      .withColumn("prev_v", lag(col("version"), 1).over(w))
      .withColumn("prev_p", lag(p, 1).over(w))
      .withColumn("is_start",
        col("prev_v").isNull
          || col("prev_v") =!= col("version") - 1
          || !(col("prev_p") <=> p))
      .withColumn("seg",
        sum(col("is_start").cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // payload is constant within a run by construction, so it can ride
    // the grouping key — the aggregate stays on the key exchange
    marked.groupBy(col(key) +: col("seg") +: payload.map(col): _*)
      .agg(min(col("version")).as("valid_from"),
        max(col("version")).as("last_v"))
      .select(
        (col(key) +: payload.map(col)) ++ Seq(
          col("valid_from"),
          when(col("last_v") === maxVersion, lit(null).cast("long"))
            .otherwise(col("last_v") + 1L).as("valid_to"),
          (col("last_v") === maxVersion).as("is_current")): _*)
  }

  /** Time travel: the dimension as of `version`, reconstructed from the
    * history — rows whose validity interval covers it.
    */
  def asOf(history: DataFrame, key: String, payload: Seq[String],
           version: Long): DataFrame =
    history.filter(col("valid_from") <= version
        && (col("valid_to").isNull || col("valid_to") > version))
      .select(col(key) +: payload.map(col): _*)

  /** The deterministic 4-version snapshot sequence both driver queries
    * build from: version v of the orders dimension
    *   - DELETES keys with o_orderkey % 11 = v (each of versions 2..4
    *     hides a rotating residue class — absence, then reappearance);
    *   - CHANGES the price of keys with o_orderkey % 13 = r once, at
    *     version r (for r in 2..4): +100.00 on a 2-dp value, tie-free
    *     (the q127 discipline).
    * Version 1 is the unmodified base, so every later state diffs
    * against a real original.
    */
  def versionedOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val versions = s.range(1, 5).select(col("id").as("version"))
    o.crossJoin(broadcast(versions))
      .filter(col("version") === 1L
        || col("o_orderkey") % 11 =!= col("version"))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 >= 2L && col("o_orderkey") % 13 <= 4L
            && col("o_orderkey") % 13 <= col("version"),
          round(col("o_totalprice") + 100.0, 2))
          .otherwise(col("o_totalprice")))
      .select(col("version"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"))
  }

  private val Payload = Seq("o_totalprice", "o_orderstatus")

  /** q154: the SCD2 history of the 4-version orders dimension. */
  def scd2HistoryQuery(s: SparkSession, dir: String): DataFrame =
    buildHistory(versionedOrders(s, dir), "o_orderkey", Payload,
        maxVersion = 4L)
      .orderBy(col("o_orderkey"), col("valid_from"))

  /** q155: version 3 reconstructed from the history — a middle version
    * with deletions AND price changes in force, so the round-trip law
    * is exercised where it can actually fail (Scd2Spec asserts it for
    * all four versions).
    */
  def scd2AsOfQuery(s: SparkSession, dir: String): DataFrame =
    asOf(buildHistory(versionedOrders(s, dir), "o_orderkey", Payload,
        maxVersion = 4L),
      "o_orderkey", Payload, version = 3L)
      .orderBy(col("o_orderkey"))

  /** Fact enrichment against the history — THE warehouse join: each fact
    * row carries a transaction version, and the lookup attaches the
    * dimension payload that was valid AT THAT VERSION (not the current
    * one — the difference between "what the customer's segment is" and
    * "what it was when the order shipped"). A fact whose dimension
    * member was deleted at its version keeps the row with a null payload
    * (left join — the missing-member case is surfaced, never dropped).
    *
    * 100 TB shape: one equi-join keyed on the dimension key with the
    * validity predicate as a residual condition — the fact side shuffles
    * (or bucket-joins) on the key exactly once; the history side is
    * dimension-sized × runs-per-key and broadcasts when it fits. No
    * per-version fan-out, no window over the facts.
    */
  def enrichFacts(facts: DataFrame, history: DataFrame, key: String,
                  versionCol: String, payload: Seq[String]): DataFrame = {
    val h = history.select(
      (col(key) +: col("valid_from") +: col("valid_to") +:
        payload.map(col)): _*)
    facts.join(h,
      facts(key) === h(key)
        && h("valid_from") <= facts(versionCol)
        && (h("valid_to").isNull || h("valid_to") > facts(versionCol)),
      "left")
      .select(facts.columns.map(facts(_)) ++ payload.map(h(_)): _*)
  }

  /** q157: lineitem facts enriched with the orders-dimension payload
    * as-of each line's transaction version tv = (l_linenumber % 4) + 1.
    * The oracle is again an INDEPENDENT derivation — orders joined
    * directly with the deletion/price rules evaluated at tv, never
    * touching the history algebra — so the driver gate proves the
    * enrichment semantics end to end.
    */
  def scd2EnrichQuery(s: SparkSession, dir: String): DataFrame = {
    val facts = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
        (col("l_linenumber") % 4 + 1).cast("long").as("tv"))
    val hist = buildHistory(versionedOrders(s, dir), "o_orderkey", Payload,
      maxVersion = 4L)
    enrichFacts(facts, hist, "o_orderkey", "tv", Payload)
      .orderBy(col("o_orderkey"), col("l_linenumber"))
  }
}
