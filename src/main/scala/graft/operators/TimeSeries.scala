package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series regularization operators: calendar gap-filling with
  * last-observation-carried-forward, and run-length interval histories
  * (SCD2-style) — the feature-engineering steps that turn an irregular
  * event stream into the dense, join-ready series a training pipeline
  * consumes.
  *
  * Scale shape: both operators are one keyed shuffle over the fact data.
  * The calendar grid is dimension-sized (days × groups — thousands of
  * rows even when the facts are 100 TB), so it broadcasts; the LOCF fill
  * is a running `last(ignoreNulls)` window that rides the grid join's
  * partitioning. The run/interval builder is the sessionization trick
  * (change-flag + running sum) over one (user, time)-windowed pass.
  */
object TimeSeries {

  /** Fill calendar gaps in a per-(group, day) aggregate and carry the last
    * seen value forward. `is_gap` marks manufactured rows; leading gaps
    * (before a group's first observation) stay null.
    */
  def gapFillLocf(daily: DataFrame, groupCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val bounds = daily.agg(min(col(dayCol)).as("lo"), max(col(dayCol)).as("hi"))
    // full calendar × group grid: dimension-sized, broadcast into the join
    val grid = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as(dayCol))
      .crossJoin(daily.select(col(groupCol)).distinct())
    val w = Window.partitionBy(col(groupCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // LEFT join ⇒ only the right side can be the broadcast build side;
    // `daily` is an aggregate of at most grid cardinality, so neither the
    // grid nor the fact scan ever shuffles for this join
    grid.join(broadcast(daily), Seq(groupCol, dayCol), "left")
      .withColumn("filled_" + valueCol,
        last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(valueCol).isNull)
      .select(col(groupCol), col(dayCol), col("filled_" + valueCol),
        col("is_gap"))
  }

  /** q73: daily revenue per order priority with every calendar day
    * present and gaps carried forward — the LOCF-regularized series.
    */
  def gapFillQuery(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    gapFillLocf(daily, "priority", "day", "revenue")
      .orderBy(col("priority"), col("day"))
  }

  /** Run-length interval history (SCD2-style): collapse consecutive
    * same-value observations per key into (valid_from, valid_to) intervals,
    * `valid_to` = the next run's start (null ⇒ current). The run id is the
    * sessionization change-flag + running-sum; ties on the timestamp break
    * by `idCol` so the runs are deterministic across engines.
    */
  def runHistory(obs: DataFrame, keyCol: String, valueCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(valueCol), 1).over(w)
    val marked = obs
      .select(col(keyCol), col(valueCol), col(tsCol), col(idCol))
      .withColumn("chg",
        when(prev.isNull || prev =!= col(valueCol), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = marked.groupBy(col(keyCol), col("run_id"), col(valueCol))
      .agg(min(col(tsCol)).as("valid_from"), count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy(col(keyCol)).orderBy(col("run_id"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** q74: per-user event-type history — which type each user was "in",
    * from when to when, built from the raw event stream.
    */
  def scd2Query(s: SparkSession, dir: String): DataFrame =
    runHistory(Tables.events(s, dir), "user_id", "event_type", "ts", "event_id")
      .select(col("user_id"), col("run_id"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"), col("is_current"))
      .orderBy(col("user_id"), col("run_id"))

  /** Gaps-and-islands: collapse a per-key set of active days into maximal
    * consecutive-day runs. The island id is `day − row_number()` — constant
    * within a run, strictly decreasing across gaps — so the grouping needs
    * no self-join or iterative closure, just one (key)-partitioned window
    * followed by a groupBy that reuses the same clustering: one shuffle
    * total regardless of streak length.
    */
  def streaks(days: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val byDay = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    days
      .withColumn("__grp", date_sub(col(dayCol), row_number().over(byDay)))
      .groupBy(col(keyCol), col("__grp"))
      .agg(count(lit(1)).as("len"), min(col(dayCol)).as("start_day"))
      .drop("__grp")
  }

  /** Additive seasonal decomposition of a daily count series:
    * trend = centered 7-day rolling mean, seasonal = day-of-week mean of
    * the detrended values, residual = value − trend − seasonal, with a
    * 2σ residual anomaly flag.
    *
    * The series itself is horizon-bounded (one row per day per group —
    * NOT fact-sized), so its windows run over a dimension-sized frame by
    * construction; the fact table is touched once, in the daily count.
    * Day-of-week comes from pure date arithmetic (pmod of an epoch
    * datediff) — engine-portable, unlike dayofweek() whose week origin
    * differs across engines. Residuals are ROUNDED before the σ fence so
    * both engines compare identical numbers.
    */
  def seasonalResiduals(daily: DataFrame, dayCol: String,
      valueCol: String): DataFrame = {
    val byDay = Window.orderBy(col(dayCol)) // horizon-bounded frame
    val trendW = byDay.rowsBetween(-3, 3)
    val detrended = daily
      .withColumn("trend", avg(col(valueCol)).over(trendW))
      .withColumn("dow",
        pmod(datediff(col(dayCol), lit("1992-01-01").cast("date")), lit(7)))
      .withColumn("det", col(valueCol) - col("trend"))
    val seasonal = detrended
      .withColumn("seasonal", avg(col("det")).over(Window.partitionBy(col("dow"))))
      .withColumn("resid",
        round(col(valueCol) - col("trend") - col("seasonal"), 4))
    seasonal
      .withColumn("sd", round(stddev_samp(col("resid")).over(Window.partitionBy()), 4))
      .select(col(dayCol), col(valueCol),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        col("resid"),
        (abs(col("resid")) > lit(2.0) * col("sd")).as("is_anomaly"))
      .orderBy(col(dayCol))
  }

  /** q103: decompose the daily event volume into trend + weekday
    * seasonality + residual, and flag anomalous days.
    */
  def seasonalQuery(s: SparkSession, dir: String): DataFrame =
    seasonalResiduals(
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      "day", "n")

  /** q86: longest consecutive-day activity streak per user (tie → the
    * earliest streak), plus the user's total active-day count. The
    * best-streak pick and the total ride the SAME user partitioning as
    * [[streaks]], so the whole query is one keyed exchange of the
    * distinct (user, day) pairs.
    */
  def streaksQuery(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val st = streaks(days, "user_id", "day")
    val byUser = Window.partitionBy(col("user_id"))
    val best = byUser.orderBy(col("len").desc, col("start_day"))
    st.withColumn("rn", row_number().over(best))
      .withColumn("tot", sum(col("len")).over(byUser))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("len").as("streak_len"),
        col("start_day").as("streak_start"), col("tot").as("n_active_days"))
      .orderBy(col("user_id"))
  }
}
