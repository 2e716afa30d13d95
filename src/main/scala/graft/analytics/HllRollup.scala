package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-grain rollup BY SKETCH MERGE — the operation mergeable sketches
  * exist for: per-DAY HyperLogLog registers are built from the facts
  * once, then every coarser grain (week, whole range) is a
  * register-wise max over the REGISTER TABLE, never a rescan of the
  * events. At 100 TB this is the difference between answering "distinct
  * users per week/month/quarter" from a few KB of persisted registers
  * and re-shuffling the fact table once per grain — the q82 sketch
  * (same mixer, same estimator, hash-verified) lifted from a single
  * union to an OLAP rollup lattice. Exact per-grain distincts ride
  * along as the verification column.
  *
  * Scale shape: ONE corpus pass builds (day, bucket, reg) — the
  * exchange is ≤ |days|·1024 fixed-width cells; every rollup level
  * aggregates that register table (metadata-sized). RollupSpec asserts
  * the merge law: week registers merged from the day table equal week
  * registers built directly from the facts.
  */
object HllRollup {

  import Hll._

  private def mix(id: Column): Column = {
    val m1 = (lit(506952114L) * (((id % P) + P) % P) + lit(1013904223L)) % P
    (lit(1566083941L) * ((m1 * m1) % P) + m1) % P
  }

  private def rho(h: Column): Column = {
    val w = shiftright(h, 10)
    lit(WBits + 1) - when(w === 0L, lit(0)).otherwise(length(bin(w)))
  }

  /** (day, bucket, reg) register table — the one corpus-grain pass. */
  def dayRegisters(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), mix(col("user_id")).as("h"))
      .select(col("day"), col("h").bitwiseAND(lit(1023L)).as("bucket"),
        rho(col("h")).as("rho"))
      .groupBy(col("day"), col("bucket")).agg(max(col("rho")).as("reg"))

  /** Register-wise merge of a register table onto a coarser period
    * column (pure metadata aggregation — no fact access).
    */
  def mergeTo(regs: DataFrame, period: Column): DataFrame =
    regs.groupBy(period.as("period"), col("bucket"))
      .agg(max(col("reg")).as("reg"))

  /** HLL estimate per period from a (period, bucket, reg) table. */
  def estimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("period"))
      .agg(count(lit(1)).as("used"),
        expr("sum(shiftleft(CAST(1 AS BIGINT), 22 - reg))").as("s_part"))
      .select(col("period"), col("used"),
        (lit(AlphaNum) / (col("s_part")
          + (lit(M.toLong) - col("used")) * lit(1L << 22)).cast("double"))
          .as("raw"))
      .select(col("period"),
        round(when(col("raw") <= lit(2.5 * M) && col("used") < M,
          lit(M.toDouble)
            * log(lit(M.toDouble) / (lit(M.toLong) - col("used"))
              .cast("double")))
          .otherwise(col("raw"))).cast("long").as("est_users"))

  /** q151: weekly + whole-range distinct users, answered from the day
    * register table by merge; exact distincts joined for comparison.
    */
  def weeklyRollupQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val days = dayRegisters(ev).localCheckpoint() // built once, merged twice
    val weekly = estimate(mergeTo(days,
      date_format(date_trunc("week", col("day")), "yyyy-MM-dd")))
    val all = estimate(mergeTo(days, lit("__all__")))
    val exact = ev.filter(col("user_id").isNotNull)
      .select(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd")
        .as("period"), col("user_id"))
      .groupBy(col("period"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .unionByName(ev.filter(col("user_id").isNotNull)
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .select(lit("__all__").as("period"), col("exact_users")))
    weekly.unionByName(all)
      .join(exact, Seq("period"))
      .select(col("period"), col("est_users"), col("exact_users"))
      .orderBy(col("period"))
  }

  /** q165: trailing-7-day SLIDING distinct users, answered from the day
    * register table — the composition sliding windows force on exact
    * distinct-count: windows overlap, so exact counting re-touches every
    * fact 7×, while mergeable registers replicate only the
    * ≤ |days|·1024-cell REGISTER table 7× (a metadata explode) and
    * max-merge per window. One corpus pass total, identical to q151's;
    * every window after that is sketch arithmetic. The exact twin rides
    * the distinct (day, user) pair table — day-grain, not event-grain —
    * through the same window explode, so even the verification column
    * never rescans raw facts per window.
    *
    * Windows anchor on days that HAVE events (the register days), the
    * same contract as the oracle's distinct-day grid.
    */
  def slidingDistinctQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val regs = dayRegisters(ev).localCheckpoint() // built once, exploded 7x
    val ends = regs.select(col("day").as("window_end")).distinct()
    val offs = explode(sequence(lit(0), lit(6))).as("off")
    val wregs = regs.select(col("day"), col("bucket"), col("reg"), offs)
      .select(date_add(col("day"), col("off")).as("window_end"),
        col("bucket"), col("reg"))
      .join(ends, Seq("window_end"), "left_semi")
      .groupBy(col("window_end"), col("bucket"))
      .agg(max(col("reg")).as("reg"))
    val est = estimate(wregs.withColumnRenamed("window_end", "period"))
      .withColumnRenamed("period", "window_end")
    val pairs = ev.filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val exact = pairs.select(col("day"), col("user_id"), offs)
      .select(date_add(col("day"), col("off")).as("window_end"),
        col("user_id"))
      .join(ends, Seq("window_end"), "left_semi")
      .groupBy(col("window_end"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, Seq("window_end"))
      .select(col("window_end"), col("est_users"), col("exact_users"),
        round((col("est_users") - col("exact_users")) * 100.0
          / col("exact_users"), 4).as("err_pct"))
      .orderBy(col("window_end"))
  }
}
