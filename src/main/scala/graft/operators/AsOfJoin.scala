package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the right row with the
  * greatest timestamp ≤ the left timestamp within the same key group —
  * the temporal join Spark has no built-in operator for (DuckDB/Pandas
  * call it ASOF JOIN / merge_asof).
  *
  * Implementation is the scalable union-and-sweep, NOT a range join:
  * tag both inputs, union them on (key, ts), and run one
  * `last(..., ignoreNulls)` window sweep ordered by (ts, side) with
  * rights sorting before lefts at equal ts (backward-inclusive
  * semantics). Cost is a single hash shuffle on the key plus one sort —
  * identical shape to a sort-merge join — versus the naive
  * `left.join(right, key && rightTs <= leftTs)` whose intermediate is
  * |left| × |matching rights| rows before the per-row argmax. At 100 TB
  * the sweep's shuffle carries each row exactly once.
  *
  * The right payload travels as ONE struct through the sweep, so a null
  * inside a payload column can never mix fields from different right
  * rows (no row tearing).
  *
  * Contract: right rows should be unique per (key, ts) — pre-reduce ties
  * deterministically (e.g. `max_by`) or the attached row is undefined.
  * Left rows with a null timestamp attach nothing (they sort before all
  * right rows).
  */
object AsOfJoin {

  /** @param left       left (probe) table
    * @param right      right (reference) table, unique per (key, ts)
    * @param key        equi-join key column name (same name both sides)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightCols  right payload columns to attach (null when no right
    *                   row is at-or-before the left row — LEFT as-of join)
    * @param tolerance  max lookback (pandas merge_asof semantics): a right
    *                   row older than leftTs − tolerance is too stale to
    *                   attach. UNIT: MICROSECONDS for timestamp/date
    *                   columns; the column's own unit for numeric epoch
    *                   columns; other types are rejected. None =
    *                   unbounded. Enforced AFTER the sweep on the attached
    *                   row's timestamp, so it costs one filter, not a
    *                   different join.
    */
  def backward(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    sweep(left, right, key, leftTs, rightTs, rightCols, tolerance,
      forward = false)

  /** Forward as-of join: attach the right row with the SMALLEST timestamp
    * ≥ the left timestamp (the "next observation" join — e.g. the first
    * event after an order). Mirror image of [[backward]]: same single
    * union-and-sweep shuffle, frame flipped to (currentRow,
    * unboundedFollowing) with a `first(ignoreNulls)` sweep, tolerance
    * bounding the look-AHEAD instead of the lookback.
    */
  def forward(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    sweep(left, right, key, leftTs, rightTs, rightCols, tolerance,
      forward = true)

  private def sweep(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      tolerance: Option[Long], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.forall(!leftCols.contains(_)),
      s"rightCols ${rightCols.filter(leftCols.contains)} collide with left " +
        "columns — rename before joining (duplicate output names would fail " +
        "at the first downstream reference, far from here)")
    // with a tolerance the sweep carries the right timestamp inside the
    // payload struct (the staleness check needs to see WHICH row was
    // attached); without one the struct stays narrow — no dead field in
    // the shuffle
    if (tolerance.isDefined) {
      require(!rightCols.contains("__rts"), "rightCols may not use __rts")
      right.schema(rightTs).dataType match {
        case org.apache.spark.sql.types.TimestampType
          | org.apache.spark.sql.types.TimestampNTZType
          | org.apache.spark.sql.types.DateType => ()
        case _: org.apache.spark.sql.types.NumericType => ()
        case other => throw new IllegalArgumentException(
          s"tolerance unsupported for $other-typed timestamps")
      }
    }
    val payloadFields = rightCols.map(c => right.schema(c)) ++
      (if (tolerance.isDefined)
        Seq(org.apache.spark.sql.types.StructField("__rts",
          right.schema(rightTs).dataType))
      else Nil)
    val payloadType = org.apache.spark.sql.types.StructType(payloadFields)
    // at equal ts the RIGHT row must be visible to the left row (inclusive
    // semantics both directions): backward sweeps look back, so rights
    // sort first; forward sweeps look ahead, so lefts sort first
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .select((Seq(col(key), col(leftTs).as("__ts"), lit(leftSide).as("__side"))
        ++ leftCols.filterNot(_ == key).map(col)
        :+ lit(null).cast(payloadType).as("__r")): _*)
    // a null right timestamp would sort nulls-first (= -infinity) and leak
    // its payload into every otherwise-unmatched left row; ASOF semantics
    // never match on null, so drop such rows before the sweep
    val r = right.filter(col(rightTs).isNotNull)
      .select((Seq(col(key), col(rightTs).as("__ts"), lit(rightSide).as("__side"))
        ++ leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))
        :+ struct((rightCols.map(col) ++
          (if (tolerance.isDefined) Seq(col(rightTs).as("__rts")) else Nil)): _*)
          .as("__r")): _*)
    val w0 = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
    val w =
      if (forward) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sweepExpr =
      if (forward) first(col("__r"), ignoreNulls = true)
      else last(col("__r"), ignoreNulls = true)
    val swept = l.unionByName(r)
      .withColumn("__r", sweepExpr.over(w))
      .filter(col("__side") === leftSide)
    val bounded = tolerance match {
      case Some(tol) =>
        // timestamp/date columns age in MICROS; numeric epoch columns in
        // their own unit (plain subtraction); other types were rejected.
        // Backward ages the attached row into the past, forward into the
        // future — the distance is positive in the sweep direction either way
        val age = right.schema(rightTs).dataType match {
          case _: org.apache.spark.sql.types.NumericType =>
            if (forward) col("__r.__rts") - col("__ts")
            else col("__ts") - col("__r.__rts")
          case _ =>
            val ts = unix_micros(col("__ts").cast("timestamp"))
            val rts = unix_micros(col("__r.__rts").cast("timestamp"))
            if (forward) rts - ts else ts - rts
        }
        swept.withColumn("__r", when(age <= tol, col("__r")))
      case None => swept
    }
    bounded.select((leftCols.map(col)
      ++ rightCols.map(c => col(s"__r.$c").as(c))): _*)
  }

  /** q39: each event annotated with the customer's most recent order at or
    * before the event time (the "state of the world as of the event" —
    * the canonical feature-engineering join in a training pipeline).
    * Ties on (custkey, orderdate) are pre-reduced to the max orderkey so
    * the attached row is deterministic on both engines.
    */
  def lastOrderQuery(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(s, dir).select("event_id", "user_id", "ts")
    val o = graft.Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("last_totalprice"))
    backward(e, o, "user_id", "ts", "o_orderdate",
        Seq("last_orderkey", "last_totalprice"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_orderkey"), round(col("last_totalprice"), 2).as("last_totalprice"))
      .orderBy(col("event_id"))
  }

  /** q84: each order annotated with the customer's FIRST event at or after
    * the order date, within a 7-day look-ahead — the forward twin of q39
    * (did the purchase get a follow-up signal, and which). Events are
    * pre-reduced to the min event_id per (user, ts) so the attached row is
    * deterministic on both engines.
    */
  def nextEventQuery(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey").as("user_id"),
        col("o_orderdate"))
    val e = graft.Tables.events(s, dir)
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_id")).as("next_event_id"))
    forward(o, e, "user_id", "o_orderdate", "ts", Seq("next_event_id"),
        tolerance = Some(7L * 86400L * 1000000L))
      .select(col("o_orderkey"), col("user_id"), col("next_event_id"))
      .orderBy(col("o_orderkey"))
  }
}
