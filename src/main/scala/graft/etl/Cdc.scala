package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** CDC log compaction — applying a change-data-capture stream of
  * I(nsert)/U(pdate)/D(elete) operations to materialize the current
  * table state, the ingestion shape every lakehouse CDC pipeline ships
  * (Debezium→merge, Hudi/Delta CDF apply). Given a log keyed by entity
  * with a total per-key order `(ts, seq)`, the current snapshot is the
  * latest op per key, minus keys whose latest op is a tombstone.
  *
  * Reference tie: the reference's pipeline refreshes dimensions by full
  * overwrite (`README.md` batch refresh); CDC apply is the incremental
  * form of the same contract, and the engine's MERGE upsert (q127) is
  * its two-table special case (one base + one delta, no tombstone
  * re-insert chains).
  *
  * 100 TB shape: ONE exchange on the entity key, and — unlike the
  * textbook `row_number() OVER (ORDER BY ts DESC) = 1` formulation,
  * which must SORT every key group — the winner is a `max(struct(ts,
  * seq, op, payload))` declarative aggregate, so Spark partial-aggregates
  * map-side: a key with a million churned ops collapses to one struct
  * per input partition before the shuffle. Compaction is therefore both
  * order-insensitive (ingest order never matters; late-arriving ops
  * older than the current winner are absorbed, CdcSpec pins it) and
  * associative — which is what makes SEGMENT compaction sound: compact
  * shards independently with `dropTombstones = false` (a tombstone must
  * outlive intermediate compactions or a delete would resurrect the
  * base segment's row — the classic LSM rule), and only the final
  * full-table pass drops them. CdcSpec asserts the segment-merge law
  * compact(seg(l1) ∪ seg(l2)) ≡ compact(l1 ∪ l2).
  */
object Cdc {

  /** Compact a CDC log to one winning row per key.
    *
    * @param log       columns: `keyCols ++ seqCols ++ opCol ++ payload`
    *                  (payload = every other column). `(keyCols,
    *                  seqCols)` must be unique — equal-rank ops of
    *                  different kinds have no defined winner.
    * @param keyCols   entity identity.
    * @param seqCols   per-key total order, major→minor (e.g. ts, seq).
    * @param opCol     op code column; `"D"` is the tombstone.
    * @param dropTombstones true → final snapshot (tombstoned keys
    *                  removed, `opCol` dropped); false → intermediate
    *                  segment compaction (winning op kept, tombstones
    *                  retained so a later merge still sees them).
    * @return winning row per key: `keyCols ++ seqCols ++ payload`
    *         (+ `opCol` when tombstones are kept) + `n_ops`, the op
    *         count folded into the winner (summed across segments when
    *         the input already carries an `n_ops` column).
    */
  def compact(log: DataFrame, keyCols: Seq[String], seqCols: Seq[String],
              opCol: String = "op", dropTombstones: Boolean = true): DataFrame = {
    val hasN = log.columns.contains("n_ops")
    val payload = log.columns.toSeq
      .filterNot(c => keyCols.contains(c) || seqCols.contains(c)
        || c == opCol || c == "n_ops")
    val packed = struct(((seqCols :+ opCol) ++ payload).map(col): _*)
    // graft_max_orderable, not the built-in max: Spark's declarative Max
    // can't hash-aggregate a struct (immutable buffer type), so max(packed)
    // plans as SortAggregate — a full sort of every input partition on the
    // key, twice (partial + final), for an order-insensitive winner. The
    // engine's TypedImperativeAggregate keeps one winner per (group,
    // mapper) and plans as ObjectHashAggregate: same single key exchange,
    // zero sorts (PlanSpec pins it). Sort-heavy plans also degrade worst
    // under memory pressure — this was the query that read 70 s on a
    // contended host while its hash twin reads ~1.5 s.
    graft.functions.GraftFunctions.register(log.sparkSession)
    val won = log.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.GraftFunctions.maxOrderable(packed).as("w"),
        (if (hasN) sum(col("n_ops")) else count(lit(1))).as("n_ops"))
    val base = if (dropTombstones) won.filter(col(s"w.$opCol") =!= "D") else won
    val opOut = if (dropTombstones) Nil else Seq(col(s"w.$opCol").as(opCol))
    base.select(keyCols.map(col)
      ++ seqCols.map(c => col(s"w.$c").as(c))
      ++ opOut
      ++ payload.map(c => col(s"w.$c").as(c))
      :+ col("n_ops"): _*)
  }

  /** Bridge an intermediate segment compaction (`dropTombstones =
    * false`) into the engine's MERGE write path: tombstone winners
    * become `delete` actions, everything else `upsert` — key-unique by
    * construction (one winner per key), which is exactly MERGE's
    * precondition. Composed with [[graft.stream.Ingest.advanceSnapshot]]
    * + [[graft.operators.MergeInto.merge]] this is the streaming CDC
    * apply: windowed batches land as versioned, crash-safe snapshots.
    *
    * Ordering contract: sequential MERGE takes "latest BATCH wins", so
    * the stream's batches must be TIME-ordered per key (the normal CDC
    * window shape). A segment containing ops older than an
    * already-applied batch would regress the row — CdcSpec pins the
    * divergence counterexample; unordered segments must go through
    * [[compact]]'s merge law instead (`n_ops` is dropped here for the
    * same reason: per-batch counts don't sum through MERGE).
    */
  def toMergeActions(segment: DataFrame, opCol: String = "op"): DataFrame =
    segment.withColumn("action",
      when(col(opCol) === "D", lit("delete")).otherwise(lit("upsert")))
      .drop(opCol, "n_ops")

  /** The deterministic CDC log both the driver query and the fuzz
    * family derive from the orders table — every op kind and every
    * compaction boundary populated:
    *   - every order INSERTs at `o_orderdate`;
    *   - keys %3 get an UPDATE at +3d (price +50.00, status "O");
    *   - keys %7 get TWO updates at the SAME ts (+2d) with seq 1 and 2
    *     — the minor-order tie the seq column must break;
    *   - keys %5 get a DELETE tombstone at +5d (null payload);
    *   - keys %15 RE-INSERT at +7d (price +200.00) — the
    *     delete-then-reappear chain, so %5-not-%15 keys vanish from the
    *     snapshot while %15 keys survive with the re-inserted payload.
    * All price edits are 2-dp additions on a 2-dp base (tie-free
    * rounding, the q127 discipline); (key, ts, seq) is unique by
    * construction.
    */
  def cdcOrdersLog(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
    val k = col("o_orderkey")
    // one ORDERS scan, not six: each order row emits its ops as a
    // conditional array a codegen'd generator explodes (a `when` with no
    // otherwise yields a null element; `filter` drops them) — the
    // union-of-filtered-scans formulation planned 6 parquet scans of the
    // same table
    def op(days: Int, seq: Long, code: String,
           status: org.apache.spark.sql.Column,
           price: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      struct((col("o_orderdate") + expr(s"INTERVAL $days DAY")).as("ts"),
        lit(seq).as("seq"), lit(code).as("op"), status.as("status"),
        price.as("price"))
    val ops = array(
      op(0, 1L, "I", col("o_orderstatus"), col("o_totalprice")),
      when(k % 3 === 0L, op(3, 1L, "U", lit("O"),
        round(col("o_totalprice") + 50.0, 2))),
      when(k % 7 === 0L, op(2, 1L, "U", lit("P"),
        round(col("o_totalprice") + 10.0, 2))),
      when(k % 7 === 0L, op(2, 2L, "U", lit("F"),
        round(col("o_totalprice") + 10.01, 2))),
      when(k % 5 === 0L, op(5, 1L, "D",
        lit(null).cast("string"), lit(null).cast("double"))),
      when(k % 15 === 0L, op(7, 1L, "I", lit("O"),
        round(col("o_totalprice") + 200.0, 2))))
    o.select(k, explode(filter(ops, _.isNotNull)).as("c"))
      .select(k, col("c.ts").as("ts"), col("c.seq").as("seq"),
        col("c.op").as("op"), col("c.status").as("status"),
        col("c.price").as("price"))
  }

  /** q168: the current orders snapshot after applying the CDC log. */
  def cdcSnapshotQuery(s: SparkSession, dir: String): DataFrame =
    compact(cdcOrdersLog(s, dir), Seq("o_orderkey"), Seq("ts", "seq"))
      .select(col("o_orderkey"), col("ts").as("last_ts"),
        col("seq").as("last_seq"), col("status"), col("price"),
        col("n_ops"))
      .orderBy(col("o_orderkey"))
}
