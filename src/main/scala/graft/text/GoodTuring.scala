package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Good–Turing frequency estimation [Good 1953; Gale & Sampson's
  * "Good–Turing without tears", 1995]: from the frequency-of-
  * frequencies table N_r (how many token types occur exactly r times),
  * estimate the probability mass of UNSEEN vocabulary P₀ = N₁/N and
  * the smoothed counts r* = (r+1)·N_{r+1}/N_r. For a training-corpus
  * platform this is the "what will more data buy" readout: P₀ is the
  * rate at which the NEXT token drawn is a brand-new type — the
  * vocabulary-growth signal scaling decisions read, where q129's
  * corpus card reports only what is already there.
  *
  * Exactness: N_r and N are exact integer counts; P₀ and r* are single
  * exact-integer divisions — no smoothing fits, no logs, nothing
  * order-dependent. Absent N_r surface as 0 with NULL r* (you cannot
  * smooth from an empty bucket), never a fake value.
  *
  * 100 TB shape: token counts are the one corpus-scale exchange
  * (partial-aggregated word count); the frequency-of-frequencies table
  * is ≤ max-count rows and collapses immediately to the fixed r ≤ 10
  * ladder. The totals row is a broadcast attach.
  */
object GoodTuring {

  /** The r ∈ [1, maxR] Good–Turing ladder over `tokens` (one `token`
    * column, one row per occurrence).
    */
  def ladder(tokens: DataFrame, maxR: Int): DataFrame = {
    val s = tokens.sparkSession
    import s.implicits._
    val counts = tokens.groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
    val freqFreq = counts.groupBy(col("c")).agg(count(lit(1)).as("n_r"))
      .localCheckpoint() // referenced twice (grid + the N_{r+1} self-join)
    val totals = freqFreq.agg(
      sum(col("c") * col("n_r")).as("n_tokens"),
      sum(col("n_r")).as("n_types"),
      coalesce(max(when(col("c") === 1L, col("n_r"))), lit(0L)).as("n1"))
    val grid = (1 to maxR).map(_.toLong).toDF("r")
    grid
      .join(freqFreq.select(col("c").as("r"), col("n_r")), Seq("r"), "left")
      .join(freqFreq.select((col("c") - 1L).as("r"),
        col("n_r").as("n_r1")), Seq("r"), "left")
      .crossJoin(broadcast(totals))
      .select(col("r"),
        coalesce(col("n_r"), lit(0L)).as("n_r"),
        coalesce(col("n_r1"), lit(0L)).as("n_r_plus_1"),
        when(col("n_r").isNotNull && col("n_r1").isNotNull,
          round((col("r") + 1L).cast("double") * col("n_r1").cast("double")
            / col("n_r").cast("double"), 6)).as("r_star"),
        col("n_tokens"), col("n_types"),
        round(col("n1").cast("double") / col("n_tokens").cast("double"), 6)
          .as("p_unseen"))
      .orderBy(col("r"))
  }

  /** q193: the Good–Turing ladder of the documents corpus under the
    * engine's standard whitespace tokenization, r ≤ 10.
    */
  def goodTuringQuery(s: SparkSession, dir: String): DataFrame =
    ladder(
      Tables.documents(s, dir).select(
        explode(filter(split(col("text"), " "), t => t =!= ""))
          .as("token")),
      maxR = 10)
}
