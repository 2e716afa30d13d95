package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Heavy CHANGERS between two periods — "deltoids" [Cormode &
  * Muthukrishnan, "What's new: finding significant differences in
  * network data streams", ToN 2005]: the keys whose frequency moved
  * most between a base and a current window. Drift reports (q125/q156)
  * say THAT a distribution moved; this says WHO moved it — the
  * exploding user, the dying traffic source, the spiking token.
  *
  * Exactness by candidate + recheck (the q93 discipline): one
  * Misra–Gries pass per period bounds mapper state by k regardless of
  * key cardinality and yields a GUARANTEED candidate superset — a key
  * absent from BOTH periods' sketches has count ≤ n_b/k and ≤ n_c/k,
  * so |Δ| ≤ max(n_b, n_c)/k and the integer output predicate
  * |Δ|·k > n_b + n_c cannot pass. The recheck then counts candidates
  * exactly (broadcast semi-join, ≤ 2(k−1) keys), so the output is
  * EXACT and the DuckDB oracle can skip the sketch entirely and
  * compute deltas directly — agreement proves the candidate set
  * covered everything above the threshold (a two-algorithm proof, like
  * q161's cut property).
  *
  * 100 TB shape: two corpus passes (sketch, recheck-count), both
  * partial-aggregated; everything between is ≤ 2(k−1) rows. The naive
  * alternative — groupBy every key in both periods and full-outer-join
  * two open-vocabulary count tables — shuffles the distinct-key
  * universe twice; this shuffles k counters per mapper and a bounded
  * candidate list.
  */
object HeavyChangers {

  /** Keys whose |count_cur − count_base| · k > n_base + n_cur, with
    * exact per-period counts. `base`/`cur` carry one `key` column.
    */
  def heavyChangers(base: DataFrame, cur: DataFrame, k: Int): DataFrame = {
    val s = base.sparkSession
    graft.functions.GraftFunctions.register(s)
    // the MG expression sketches strings; integer keys round-trip the
    // cast exactly, so candidates come back in the key's native type
    val keyType = base.schema("key").dataType
    def cand(df: DataFrame): DataFrame =
      df.agg(graft.functions.GraftFunctions
          .heavyCandidates(col("key").cast("string"), k).as("c"))
        .select(explode(col("c")).as("ks"))
        .select(col("ks").cast(keyType).as("key"))
    val cands = cand(base).unionByName(cand(cur)).distinct()
    def counts(df: DataFrame, out: String): DataFrame =
      df.join(broadcast(cands), Seq("key"), "left_semi")
        .groupBy(col("key")).agg(count(lit(1)).as(out))
    val nb = base.agg(count(lit(1)).as("n_b"))
    val nc = cur.agg(count(lit(1)).as("n_c"))
    counts(base, "n_base").join(counts(cur, "n_cur"), Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nc))
      .filter(abs(col("n_cur") - col("n_base")) * k > col("n_b") + col("n_c"))
      .select(col("key"), col("n_base"), col("n_cur"),
        (col("n_cur") - col("n_base")).as("delta"))
      .orderBy(abs(col("delta")).desc, col("key"))
  }

  /** q167: users whose activity moved most between the event stream's
    * halves (the q156 event_id split), k = 512 — so the output
    * threshold is |Δ| > n/512 of the whole stream. The driver corpus
    * is balanced by construction (few survivors); the fuzz corpora
    * plant second-half burst users so the operator's selection and
    * tie-breaks are exercised across seeds.
    */
  def heavyChangersQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"),
      col("user_id").as("key"))
    val mid = e.agg((max(col("event_id")) / 2).as("m"))
    val tagged = e.crossJoin(broadcast(mid))
    heavyChangers(
      tagged.filter(col("event_id") <= col("m")).select(col("key")),
      tagged.filter(col("event_id") > col("m")).select(col("key")),
      k = 512)
      .withColumnRenamed("key", "user_id")
  }
}
