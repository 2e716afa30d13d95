package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bitemporal ledger resolution — the two-axis completion of the SCD2
  * tier [Snodgrass, "Developing Time-Oriented Database Applications in
  * SQL", ch. 10; the SQL:2011 system/application-time model]: q154's
  * history answers "what was true at V"; a bitemporal ledger also
  * answers "what did we BELIEVE at transaction time T was true at V" —
  * the axis that separates a RESTATEMENT (we learned the original was
  * wrong: new assertion, old valid period) from a LATE ARRIVAL (we
  * learned late of a real change: new assertion, backdated valid-from)
  * from a RETRACTION (tombstone assertion). Append-only: assertions are
  * never mutated, so yesterday's report is reproducible forever — the
  * audit property regulated pipelines need.
  *
  * Resolution rule for a probe (T, V): among assertions with
  * `recorded_tx ≤ T` (known by T) and `valid_from ≤ V` (effective by
  * V), the winner is `max(struct(valid_from, recorded_tx))` — the most
  * specific effective period, ties to later knowledge — then tombstone
  * winners drop. A declarative struct-max, so it partial-aggregates
  * map-side (the q168 discipline) and DuckDB replays it exactly.
  *
  * 100 TB shape: the probe grid is query-sized and BROADCAST; the
  * ledger scans once, fans out only ×|grid|, and resolves on ONE
  * (T, V, key) exchange. No self-join, no window over the ledger.
  */
object Bitemporal {

  /** Resolve `ledger` (key, valid_from, recorded_tx, alive, payload...)
    * against every probe in `grid` (T, V): one row per (T, V, key)
    * alive under the resolution rule, carrying the winning payload.
    */
  def resolve(ledger: DataFrame, grid: DataFrame,
              payload: Seq[String]): DataFrame = {
    val won = ledger.join(broadcast(grid),
        col("recorded_tx") <= col("T") && col("valid_from") <= col("V"))
      .groupBy(col("T"), col("V"), col("key"))
      .agg(max(struct(
        (col("valid_from") +: col("recorded_tx") +: col("alive")
          +: payload.map(col)): _*)).as("w"))
      .filter(col("w.alive"))
    won.select(col("T") +: col("V") +: col("key")
      +: payload.map(c => col(s"w.$c").as(c)): _*)
  }

  /** The deterministic bitemporal orders ledger — every assertion kind
    * populated (all price edits 2-dp tie-free, the q127 discipline):
    *   - every order: base assertion, recorded tx 1, valid from 1;
    *   - keys %9 = 0: RESTATEMENT at tx 2 — valid_from stays 1, price
    *     corrected +1.00 (the original was wrong);
    *   - keys %9 = 3: prompt change at tx 2 — valid_from 2, price
    *     +50.00 (a real change, learned on time);
    *   - keys %9 = 6: LATE ARRIVAL at tx 3 — valid_from 2 (backdated:
    *     it happened at v2, we learned at tx 3), price +75.00;
    *   - keys %9 = 7: RETRACTION at tx 3 — tombstone valid from 3.
    */
  def ordersLedger(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("key"), col("o_totalprice"))
    val k = col("key")
    def a(vf: Long, tx: Long, alive: Boolean,
          price: org.apache.spark.sql.Column) =
      struct(lit(vf).as("valid_from"), lit(tx).as("recorded_tx"),
        lit(alive).as("alive"), price.as("price"))
    val ops = array(
      a(1L, 1L, alive = true, col("o_totalprice")),
      when(k % 9 === 0L, a(1L, 2L, alive = true,
        round(col("o_totalprice") + 1.0, 2))),
      when(k % 9 === 3L, a(2L, 2L, alive = true,
        round(col("o_totalprice") + 50.0, 2))),
      when(k % 9 === 6L, a(2L, 3L, alive = true,
        round(col("o_totalprice") + 75.0, 2))),
      when(k % 9 === 7L, a(3L, 3L, alive = false,
        lit(null).cast("double"))))
    o.select(k, explode(filter(ops, _.isNotNull)).as("c"))
      .select(k, col("c.valid_from").as("valid_from"),
        col("c.recorded_tx").as("recorded_tx"), col("c.alive").as("alive"),
        col("c.price").as("price"))
  }

  /** q176: the full 3×3 (T, V) probe grid resolved to per-cell
    * aggregates — each cell is "the sum of prices we believed at T were
    * in force at V" (restatements shift cells with T ≥ 2 at every V;
    * late arrivals shift only T = 3 cells at V ≥ 2; retractions empty
    * their keys only from the (3, 3) cell).
    */
  def bitemporalQuery(s: SparkSession, dir: String): DataFrame = {
    val grid = s.range(1, 4).select(col("id").as("T"))
      .crossJoin(s.range(1, 4).select(col("id").as("V")))
    resolve(ordersLedger(s, dir), grid, Seq("price"))
      .groupBy(col("T"), col("V"))
      .agg(count(lit(1)).as("n_keys"),
        round(sum(col("price")), 2).as("sum_price"))
      .orderBy(col("T"), col("V"))
  }
}
