package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dyadic Count–Min quantiles [Cormode & Muthukrishnan, J. Algorithms
  * 55(1) §4.2] — the CM paper's own range-query application, completing
  * the q141 point-query sketch into a mergeable RANK/QUANTILE summary.
  * q35/q116/q130 compute exact percentiles by sorting the data; at
  * 100 TB an exact global quantile is a full shuffle of the column,
  * while this sketch reduces the whole corpus to a FIXED-size counter
  * matrix (L levels × d rows × w buckets) that partial aggregation
  * merges for free, then answers any quantile from the matrix alone.
  *
  * Build: values quantize to integer cents saturated into [0, 2^L); at
  * each dyadic level ℓ the key is `v >> ℓ` (the node of the dyadic tree
  * covering [nd·2^ℓ, (nd+1)·2^ℓ)), counted into a per-level CM sketch
  * with the q141 affine-over-Mersenne hash family. Spark's map-side
  * combine collapses the ×L×d explode before the one fixed-size
  * exchange — cells are ≤ groups·L·d·w rows REGARDLESS of corpus size,
  * the same scale-independence argument as q141.
  *
  * Query: classic dyadic descent. Start at the root with target rank
  * ⌈p·n⌉; at each level estimate the LEFT child's count (CM min over d
  * probed cells, absent cell = 0) and branch: est_left ≥ remaining
  * target → descend left, else subtract and go right. L metadata-sized
  * broadcast joins on a |groups|·|ps|-row frontier — after the build,
  * no step ever touches the corpus again. Every quantity is integer
  * (counts, node ids, targets), so the DuckDB oracle replays the build
  * and all L descent steps bit-for-bit (q143 is hash-verified).
  *
  * Error: CM only OVERestimates, so the descent can only stop early —
  * est_quantile ≤ exact_quantile deterministically, and the rank error
  * is bounded by the ≤L overestimates on the descent path (each ≤ εn
  * w.h.p., ε = e/w) — both directions asserted in CmQuantilesSpec,
  * along with build mergeability (sketch(A∪B) = cellwise sum).
  */
object CmQuantiles {

  /** Dyadic levels: domain [0, 2^20) integer cents ($0 – $10,485.75);
    * values outside saturate into the extreme buckets (the standard
    * bounded-domain sketch contract — widen L for a wider domain; cell
    * count grows only linearly in L).
    */
  val Levels: Int = 20
  val Domain: Long = 1L << Levels

  private def cents(value: Column): Column =
    least(greatest(round(value * 100).cast("long"), lit(0L)), lit(Domain - 1L))

  /** Per-group level-ℓ CM cells `(grp, level, r, bucket, cnt)` for a
    * `(grp, value)` frame — one fixed-size exchange, map-side combined.
    */
  def sketch(rows: DataFrame): DataFrame = {
    val v = rows.filter(col("value").isNotNull)
      .select(col("grp"), cents(col("value")).as("v"))
      .select(col("grp"), explode(sequence(lit(0), lit(Levels - 1))).as("level"),
        col("v"))
      .select(col("grp"), col("level"),
        expr("shiftright(v, level)").as("nd"))
    // ONE corpus pass: the d hash rows explode per dyadic row instead of
    // unioning d full re-scans of the exploded (×L) corpus view; the
    // bucket arithmetic mirrors CountMin.bucket exactly (floor-mod below
    // P first), with (a, b) as per-row literals from the exploded struct
    val hs = array(CountMin.Hashes.map { case (i, a, b) =>
      struct(lit(i).as("r"), lit(a).as("a"), lit(b).as("b"))
    }: _*)
    v.select(col("grp"), col("level"), col("nd"), explode(hs).as("h"))
      .select(col("grp"), col("level"), col("h.r").as("r"),
        (((col("h.a") * (((col("nd") % CountMin.P) + CountMin.P) % CountMin.P)
          + col("h.b")) % CountMin.P) % CountMin.W).as("bucket"))
      .groupBy(col("grp"), col("level"), col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Dyadic-descent quantile estimates for probabilities `ps`, answered
    * from the sketch alone: (grp, p, n, target_rank, est_cents,
    * est_value). `n` is the exact per-group count (one cheap aggregate —
    * a real deployment would persist it next to the sketch).
    */
  def quantiles(rows: DataFrame, ps: Seq[Double]): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val cells = sketch(rows).coalesce(1).localCheckpoint()
    val hashes = CountMin.Hashes.toDF("r", "a", "b")
    // exact per-group count read FROM the sketch (every value contributes
    // exactly once per (level, r) slice, so one slice's bucket sum is the
    // count) — no second corpus scan
    val n = cells
      .filter(col("level") === 0 && col("r") === CountMin.Hashes.head._1)
      .groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    var frontier = n
      .crossJoin(broadcast(ps.toDF("p")))
      .withColumn("target", ceil(col("p") * col("n")))
      .withColumn("nd", lit(0L))
      .withColumn("rank_below", lit(0L))
    for (l <- Levels - 1 to 0 by -1) {
      // probe the LEFT child (node 2·nd at level l) through all d rows;
      // absent cell = 0 (the sparse form's implicit zeros), est = min.
      // All 20 levels join the SAME broadcast(cells) frame with the level
      // pinned in the join CONDITION — the broadcast subplans canonicalize
      // identically, so ReuseExchange builds the matrix broadcast once
      // (a per-r broadcast-left-join formulation with zero frontier
      // exchanges was TRIED and measured slower: 80 joins' planning cost
      // exceeded what the 20 tiny frontier exchanges cost).
      val est = frontier
        .crossJoin(broadcast(hashes))
        .withColumn("bucket",
          ((col("a") * (((col("nd") * 2) % CountMin.P + CountMin.P) % CountMin.P)
            + col("b")) % CountMin.P) % CountMin.W)
        .as("f")
        .join(broadcast(cells).as("c"),
          col("f.grp") === col("c.grp") && col("c.level") === l
            && col("f.r") === col("c.r")
            && col("f.bucket") === col("c.bucket"),
          "left")
        .groupBy(col("f.grp").as("grp"), col("p"), col("n"), col("target"),
          col("nd"), col("rank_below"))
        .agg(min(coalesce(col("cnt"), lit(0L))).as("est_left"))
      frontier = est
        .withColumn("go_left",
          col("rank_below") + col("est_left") >= col("target"))
        .select(col("grp"), col("p"), col("n"), col("target"),
          when(col("go_left"), col("nd") * 2)
            .otherwise(col("nd") * 2 + 1).as("nd"),
          when(col("go_left"), col("rank_below"))
            .otherwise(col("rank_below") + col("est_left")).as("rank_below"))
      // the frontier is |groups|·|ps| rows; checkpoint every few levels
      // only to truncate the 20-join lineage, never to move data
      if (l % 5 == 0 && l > 0) frontier = frontier.localCheckpoint()
    }
    frontier.select(col("grp"), col("p"), col("n"),
      col("target").as("target_rank"), col("nd").as("est_cents"),
      round(col("nd") / 100.0, 2).as("est_value"))
      .orderBy(col("grp"), col("p"))
  }

  /** q143: per-event-type p50/p90/p99 of `value` from the dyadic CM
    * sketch — the mergeable twin of q35's exact percentiles.
    */
  def cmQuantilesQuery(s: SparkSession, dir: String): DataFrame =
    quantiles(
      Tables.events(s, dir)
        .select(col("event_type").as("grp"), col("value")),
      Seq(0.5, 0.9, 0.99))
      .withColumnRenamed("grp", "event_type")
}
