package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact Shapley-value channel attribution [Shapley 1953; the coalition
  * formulation for marketing journeys follows Zhao, Mahboobi &
  * Bagheri, "Shapley Value Methods for Attribution Modeling in Online
  * Advertising", 2018]: the characteristic function
  * v(S) = #conversions whose touched-channel set ⊆ S, and each
  * channel's credit is its average marginal contribution over all
  * coalition orders — the only attribution rule that is efficient,
  * symmetric and dummy-free, where q59's last-touch and q150's
  * time-decay are position heuristics. Completes the attribution
  * trio.
  *
  * Exactness discipline: journeys collapse to CHANNEL-SET BITMASKS, so
  * v and the Shapley sum live on the 2^k coalition lattice (k =
  * |channels|, single digits) — no sampling, no permutation
  * enumeration. All weights are integers: φ_i·k! = Σ_{S ∌ i}
  * |S|!·(k−1−|S|)!·(v(S∪{i}) − v(S)), accumulated as exact longs and
  * divided by k! only at the end, so the doubles replay bit-for-bit.
  *
  * 100 TB shape: the user-keyed conversion aggregate and the
  * touch-collection join are the only corpus exchanges, and the join
  * reuses the same user_id hash partitioning (the q119 pattern — AQE
  * plans no extra exchange). Everything downstream is the ≤ 2^k-row
  * mask-count table crossed with the 2^k-row coalition grid: metadata-
  * sized regardless of corpus scale, and the grid windows are the
  * documented dimension-sized exception.
  */
object Shapley {

  private def factorial(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)

  /** Shapley credit per channel. `touches` = (user_id, channel) rows of
    * pre-conversion touchpoints for CONVERTING users only; channels are
    * indexed by lexicographic rank. Output: one row per channel with
    * the exact k!-scaled integer numerator and the double credit.
    */
  def credit(touches: DataFrame): DataFrame = {
    val s = touches.sparkSession
    // Channel codebook: lexicographic rank over the (tiny) distinct set.
    // Checkpointed — it is referenced four times downstream (mask build,
    // both lattice joins, the output), and without materialization each
    // reference re-plans the corpus-distinct (the q145 caching lesson).
    val chan = touches.select(col("channel")).distinct()
      .withColumn("idx",
        (row_number().over(Window.orderBy(col("channel"))) - 1).cast("int"))
      .localCheckpoint()
    val k = chan.count().toInt
    require(k >= 1 && k <= 16, s"Shapley lattice needs 1..16 channels, got $k")
    val kFact = factorial(k)
    // Per-converter channel-set bitmask, then counts per mask (<= 2^k rows).
    val bit = expr("shiftleft(CAST(1 AS BIGINT), idx)")
    val masks = touches
      .join(broadcast(chan), Seq("channel"))
      .select(col("user_id"), col("idx")).distinct()
      .groupBy(col("user_id"))
      .agg(sum(bit).as("mask"))
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("n_conv"))
    // Coalition lattice: v(S) = sum of conversions whose mask ⊆ S.
    val grid = s.range(0, 1L << k).select(col("id").as("coal"))
    val v = grid
      .join(masks, (col("mask").bitwiseAND(col("coal"))) === col("mask"), "left")
      .groupBy(col("coal"))
      .agg(coalesce(sum(col("n_conv")), lit(0L)).as("v"))
    // Marginal contributions: for each channel i and coalition S not
    // containing i, weight |S|!(k-1-|S|)! — a k-row broadcast lookup.
    import s.implicits._
    val weights = (0 until k)
      .map(sz => (sz, factorial(sz) * factorial(k - 1 - sz))).toDF("sz", "w")
    val vWith = v.withColumnRenamed("coal", "coal_i").withColumnRenamed("v", "v_i")
    val numerators = chan
      .join(v, (col("coal").bitwiseAND(bit)) === 0L)
      .join(vWith, col("coal_i") === col("coal").bitwiseOR(bit))
      .join(broadcast(weights), bit_count(col("coal")).cast("int") === col("sz"))
      .groupBy(col("channel"))
      .agg(sum(col("w") * (col("v_i") - col("v"))).as("phi_num"))
    val vAll = v.agg(max(col("v")).as("v_full")) // v is monotone: max = v(N)
    numerators
      .crossJoin(broadcast(vAll))
      .select(
        col("channel"), col("phi_num"), col("v_full"),
        round(col("phi_num").cast("double") / lit(kFact.toDouble), 6)
          .as("phi"),
        round(col("phi_num").cast("double")
          / (lit(kFact.toDouble) * col("v_full").cast("double")), 6)
          .as("share_of_conversions"))
      .orderBy(col("channel"))
  }

  /** Pre-conversion touches from the events stream: a converter is a
    * user with >= 1 'purchase'; their touches are the distinct other
    * event types strictly before their FIRST purchase.
    */
  def conversionTouches(events: DataFrame): DataFrame = {
    val conv = events
      .filter(col("user_id").isNotNull && col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("conv_ts"))
    events
      .filter(col("user_id").isNotNull && col("event_type") =!= "purchase")
      .join(conv, Seq("user_id"))
      .filter(col("ts") < col("conv_ts"))
      .select(col("user_id"), col("event_type").as("channel"))
  }

  /** q186: exact Shapley conversion credit over the event channels. */
  def shapleyQuery(s: SparkSession, dir: String): DataFrame =
    credit(conversionTouches(Tables.events(s, dir)))
}
