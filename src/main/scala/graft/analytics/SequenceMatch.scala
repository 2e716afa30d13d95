package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** MATCH_RECOGNIZE-style sequence-pattern detection: encode each key's
  * time-ordered event types as a compact symbol string, then run regex
  * patterns over it — contiguous behavioral motifs ("a view run, then a
  * click run, then a purchase") that q65's funnel (subsequence, gaps
  * allowed) deliberately does not express.
  *
  * Scale shape: ONE grouped pass builds the per-key string; its state is
  * one symbol per event for that key — bounded by per-entity activity
  * (the session/horizon bound, same budget q74's run history carries),
  * not by corpus size. Pattern evaluation is then an embarrassingly
  * parallel per-row regex over strings of that length; adding patterns
  * costs no extra shuffle (they stack as columns on one pass).
  *
  * Determinism: events order by (ts, event_id) — the engine-portable
  * tie-break every sequence operator here uses — and symbols concatenate
  * in that order on both engines.
  */
object SequenceMatch {

  /** One row per key: the ordered symbol string. `symbol` must yield a
    * single character per event (map types to letters first).
    */
  def sequenceStrings(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, symbol: Column): DataFrame =
    events
      .select(col(keyCol), col(tsCol), col(idCol), symbol.as("sym"))
      .groupBy(col(keyCol))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col(tsCol), col(idCol), col("sym")))),
        x => x.getField("sym")), "").as("seq"))

  /** Count matches of several regex patterns over each key's sequence;
    * returns one summary row per pattern: how many keys match at least
    * once and the total non-overlapping match count.
    *
    * All patterns evaluate as stacked columns of ONE scalar aggregate
    * over ONE pass of the sequence table (a per-pattern union would
    * rebuild the sequences once per pattern); the wide single row then
    * reshapes to (pattern, counts) rows with `stack` — an Expand over
    * one row.
    */
  def patternCounts(seqs: DataFrame, patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.forall(_._1.matches("[A-Za-z0-9_]+")),
      "pattern names must be identifier-safe")
    val aggs = patterns.flatMap { case (name, re) => Seq(
      sum(when(col("seq").rlike(re), 1L).otherwise(0L)).as(s"k_$name"),
      sum(regexp_count(col("seq"), lit(re)).cast("long")).as(s"c_$name"))
    }
    val stackExpr = s"stack(${patterns.size}, " + patterns
      .map { case (n, _) => s"'$n', k_$n, c_$n" }.mkString(", ") +
      ") as (pattern, n_keys_matching, n_matches)"
    seqs.agg(aggs.head, aggs.tail: _*)
      .select(expr(stackExpr))
      .orderBy(col("pattern"))
  }

  /** q99: behavioral motifs over each user's event-type sequence.
    * Symbols: v=view c=click p=purchase s=signup e=error.
    */
  def motifQuery(s: SparkSession, dir: String): DataFrame = {
    val sym = substring(col("event_type"), 1, 1) // types have distinct initials
    val seqs = sequenceStrings(Tables.events(s, dir),
      "user_id", "ts", "event_id", sym)
    patternCounts(seqs, Seq(
      "browse_to_buy" -> "v+c+p",      // view run → click run → purchase
      "error_retry"   -> "e[vc]*e",    // error, browsing, error again
      "instant_buy"   -> "sp"          // purchase right after signup
    ))
  }
}
