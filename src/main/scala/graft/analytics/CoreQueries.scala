package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.etl.UnifiedJoin
import graft.text.Sentiment

/** Relational operator surface of the engine, expressed over the driver's
  * TPC-H-ish testdata. Each query maps one or more reference operators
  * (SURVEY.md §2 ids in the Scaladoc) onto an idiomatic, Catalyst-optimizable
  * DataFrame plan. Every query:
  *   - aliases every computed column (oracle compare is name-keyed),
  *   - ends in a total-order `orderBy` (deterministic output),
  *   - keeps all expressions inside codegen'd built-ins (no UDFs).
  */
object CoreQueries {

  /** A7/A2 — grouped aggregation with filter pushdown (pricing summary à la
    * "sentiment trends by city", `README.md:303-305`). Filter reaches the
    * parquet scan as a PushedFilter.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") < lit("2001-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** J1/J2/P3 — the reference's flagship: overlap-rename + two left joins
    * into a wide unified table (`unified_data_analytics.py:25-47`).
    * orders ≙ reviews (fact), customer ≙ users, nation ≙ businesses.
    * Columns are stripped to generic names so `name` genuinely collides
    * between customer and nation, exercising the dynamic rename.
    */
  def unifiedAnalytics(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.orders(s, dir).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("cust_id"),
      col("o_totalprice").as("total"),
      col("o_orderstatus").as("status"),
      col("o_orderdate").as("order_date"),
      col("o_orderpriority").as("priority"))
    val dim1 = Tables.customer(s, dir).select(
      col("c_custkey").as("cust_id"),
      col("c_name").as("name"),
      col("c_nationkey").as("nation_id"),
      col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("segment"))
    val dim2 = Tables.nation(s, dir).select(
      col("n_nationkey").as("nation_id"),
      col("n_name").as("name"),
      col("n_regionkey").as("region_id"))
    UnifiedJoin.unify(fact, dim1, dim2, key1 = "cust_id", key2 = "nation_id",
        factPrefix = "order", dim2Prefix = "nation")
      .orderBy(col("order_id"))
  }

  /** W1/J3 — top-k by sort with join + literal filter (top reviewers of a
    * named business, `neo4j_test.cypher:50-53`). `TakeOrderedAndProject`
    * physical op: no global sort materialization.
    */
  def topOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("o_orderkey").as("order_id"), col("c_name").as("cust_name"),
        col("o_totalprice").as("total"))
      .orderBy(col("total").desc, col("order_id"))
      .limit(5)
  }

  /** W1 generalized — top-k *per group* via `row_number` window (the
    * "top 5 reviewers of a business" pattern per-business, SURVEY.md §2.5).
    */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey").as("cust_id"), col("rnk"),
        col("o_orderkey").as("order_id"), col("o_totalprice").as("total"))
      .orderBy(col("cust_id"), col("rnk"))
  }

  /** J4 — anti-join (reviews lacking a writer / orphan nodes,
    * `neo4j_test.cypher:7-37`): customers with no orders.
    */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey").as("cust_id"), col("c_name").as("name"))
      .orderBy(col("cust_id"))
  }

  /** J5 — semi-join (friendship endpoints must exist, `graph.cypher:93-95`):
    * customers having at least one order.
    */
  def customersWithOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey").as("cust_id"), col("c_name").as("name"))
      .orderBy(col("cust_id"))
  }

  /** A3 — grouped count + HAVING (duplicate check, `neo4j_test.cypher:2-5`;
    * here: power users with > 5 events).
    */
  def powerUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .filter(col("n_events") > 5)
      .orderBy(col("user_id"))

  /** A1 — single-pass null-count profiling (delegates to the quality
    * library, `graft.quality.Profiling.nullProfile`).
    */
  def nullProfileOrders(s: SparkSession, dir: String): DataFrame =
    graft.quality.Profiling.nullProfile(Tables.orders(s, dir))

  /** P8 — when/otherwise chains (sentiment labels at ±0.05,
    * `Review_ETL.py:79-84`; here: value buckets over events).
    */
  def valueBuckets(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("bucket",
        when(col("value") > 75.0, "high")
          .when(col("value") < 25.0, "low")
          .otherwise("mid"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("event_type"), col("bucket"))

  /** P10/P11 — per-row horizontal fold + derived arithmetic
    * (engagement_score = useful+funny+cool, `Review_ETL.py:66-70`;
    * days_open count-if fold, `Business_ETL.py:133-135`).
    */
  def engagement(s: SparkSession, dir: String): DataFrame = {
    val charges = Seq(col("l_discount"), col("l_tax"))
    Tables.lineitem(s, dir).select(
      col("l_orderkey").as("order_id"),
      col("l_linenumber").cast("long").as("line_no"),
      round(col("l_quantity") + col("l_discount") * 100.0 + col("l_tax") * 100.0, 2)
        .as("engagement_score"),
      charges.map(c => when(c > 0.0, 1L).otherwise(0L)).reduce(_ + _).as("n_charges"))
      .orderBy(col("order_id"), col("line_no"))
  }

  /** Time-series-lite — `to_date` truncation + daily rollup
    * (`Review_ETL.py:92-93`; dashboard trends `README.md:303-305`).
    */
  def dailyEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("event_date", to_date(col("ts")))
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_date"))

  /** Month-grain rollup (trends "by month", SURVEY.md §2.10). */
  def monthlyOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("order_month", date_trunc("month", col("o_orderdate")))
      .groupBy(col("order_month"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("order_month"))

  /** D3/A6 — bidirectional edge closure + degree count
    * (`graph.cypher:94-95`, `neo4j_test.cypher:40-44`): undirected
    * supplier↔part edges from lineitem, deduped, per-node degree.
    */
  def degreeBidirectional(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.lineitem(s, dir).select(
      col("l_suppkey").as("src"), (col("l_partkey") + 1000000L).as("dst"))
    val undirected = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // degree = distinct neighbors — countDistinct under groupBy is ONE
    // shuffle with map-side partial distinct, vs the naive
    // union.distinct().groupBy().count() which shuffles the full edge list
    // twice (by (src,dst), then by src). Halves shuffled bytes at scale.
    undirected.groupBy(col("src")).agg(countDistinct(col("dst")).as("degree"))
      .select(col("src").as("node"), col("degree"))
      .orderBy(col("node"))
  }

  /** J4/A3/D2 — graph-integrity checks as one summary table
    * (`neo4j_test.cypher:1-47`): orphan edges + duplicate keys.
    */
  def integrityChecks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    def chk(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("chk"), col("n"))
    val orphanLines  = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
    val orphanOrders = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
    val dupOrderKeys = o.groupBy(col("o_orderkey")).count().filter(col("count") > 1)
    chk("dup_order_keys", dupOrderKeys)
      .union(chk("lineitem_without_order", orphanLines))
      .union(chk("order_without_customer", orphanOrders))
      .orderBy(col("chk"))
  }

  /** Distinct-cardinality profiling (exact; the engine also exposes
    * `approx_count_distinct` for the 100 TB posture — see
    * [[approxDistinctStats]], non-oracle).
    */
  def distinctStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_suppliers"),
      count(lit(1)).as("n_rows"))

  /** HLL-sketch profiling for 100 TB scale (single pass, fixed memory);
    * approximate → excluded from the DuckDB oracle.
    */
  def approxDistinctStats(s: SparkSession, dir: String): DataFrame =
    // rsd 0.02 (not the 0.05 default): the HLL++ sketch grows to ~token
    // kilobytes — still single-pass fixed memory — and the measured error
    // drops under the 5% floor QualityFloorsSpec pins
    Tables.lineitem(s, dir).agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("n_orders"),
      approx_count_distinct(col("l_partkey"), 0.02).as("n_parts"),
      approx_count_distinct(col("l_suppkey"), 0.02).as("n_suppliers"))

  /** §2.10 "sentiment trends by city" ≙ revenue by nation: 3-way join +
    * grouped agg. Dim joins are broadcast (nation/customer ≪ orders).
    */
  def nationRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"),
        round(avg(col("o_totalprice")), 4).as("avg_order_value"))
      .orderBy(col("nation"))
  }

  /** §2.10 "distribution of elite reviewers across locations" ≙ high-balance
    * customers per nation: filter + join + grouped count (`README.md:307`).
    */
  def eliteDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_acctbal") > 5000.0)
    val n = Tables.nation(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "inner")
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_elite"))
      .orderBy(col("nation"))
  }

  /** §2.10 "reviewer activity and engagement scores" ≙ per-user event
    * activity (`README.md:306`).
    */
  def userActivity(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        max(col("ts")).as("last_seen"))
      .orderBy(col("user_id"))

  /** from_json / JSON-path extraction (`Business_ETL.py:72-81`): pull a typed
    * field out of the `props` JSON-string column.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    // sort FIRST, parse after: a global orderBy range-partitions by sampling
    // its child, so putting the parse below the sort would execute the JSON
    // path twice (sampling pass + real pass)
    Tables.events(s, dir)
      .select(col("event_id"), col("props"))
      .orderBy(col("event_id"))
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** S8 catalog surface — temp-view registration + `spark.sql` (the engine's
    * replacement for Glue/Athena, SURVEY.md §3.3). The SQL text is shared
    * verbatim with the DuckDB oracle; window ranking orders by the ROUNDED
    * revenue so float-sum noise can't flip near-ties across engines.
    */
  val topNationsPerRegionSql: String =
    """SELECT region, nation, revenue, rnk FROM (
      |  SELECT r.r_name AS region, n.n_name AS nation,
      |    round(sum(o.o_totalprice), 2) AS revenue,
      |    CAST(row_number() OVER (PARTITION BY r.r_name
      |      ORDER BY round(sum(o.o_totalprice), 2) DESC, n.n_name) AS BIGINT) AS rnk
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY r.r_name, n.n_name
      |) t WHERE rnk <= 3 ORDER BY region, rnk""".stripMargin

  def sqlTopNationsPerRegion(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    Tables.region(s, dir).createOrReplaceTempView("region")
    s.sql(topNationsPerRegionSql)
  }

  /** U1 surface over testdata — sentiment scoring rolled up by language.
    * Depends on the engine's own lexicon (not SQL-expressible) → rows-only.
    */
  /** Exact interpolated percentiles (Spark `percentile` ≙ DuckDB
    * `quantile_cont`, both linear interpolation on the sorted values).
    * Exact percentile needs the full sorted group at 100 TB — the
    * approximate path for scale is [[approxDistinctStats]]-style sketches
    * via `percentile_approx` (see q31 pattern).
    */
  def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy(col("event_type"))

  /** q45: batch sessionization — a gap over 30 minutes starts a new
    * session (the lag-flag-cumsum window chain; the streaming counterpart
    * is `stream.WindowedAggs.sessionize` via mapGroupsWithState). All
    * event-time math at microsecond resolution; the per-user session
    * counter is deterministic because the window orders by (t, event_id).
    * One shuffle on user_id serves both windows AND the final group-by.
    */
  def eventSessions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 30L * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      .withColumn("new_sess",
        when(lag(col("t"), 1).over(w).isNull
          || col("t") - lag(col("t"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("t")).as("start_us"), max(col("t")).as("end_us"))
      .withColumn("duration_sec",
        round((col("end_us") - col("start_us")) / 1000000.0, 3))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q46: 7-day rolling spend per customer — a RANGE-frame window over
    * epoch micros (each row's frame is its trailing week), the moving
    * aggregate pattern for temporal feature engineering.
    */
  def rollingRevenue(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekUs = 7L * 86400L * 1000000L
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("t"))
      .rangeBetween(-weekUs, 0)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        col("o_totalprice"))
      .withColumn("rolling_7d_spend", round(sum(col("o_totalprice")).over(w), 2))
      .withColumn("rolling_7d_orders",
        count(lit(1)).over(w).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("rolling_7d_spend"), col("rolling_7d_orders"))
      .orderBy(col("o_orderkey"))
  }

  /** q47: winsorized per-type value stats — clip at the exact p05/p95
    * (training pipelines clamp outliers before normalization), then
    * compare the clipped mean against the raw mean.
    */
  def winsorizedStats(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_type"), col("value"))
    val bounds = e.groupBy(col("event_type")).agg(
      expr("percentile(value, 0.05)").as("p05"),
      expr("percentile(value, 0.95)").as("p95"))
    e.join(broadcast(bounds), Seq("event_type"))
      .withColumn("clipped", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("raw_mean"),
        round(avg(col("clipped")), 4).as("winsorized_mean"))
      .orderBy(col("event_type"))
  }

  /** q49: per-group z-score normalization (the feature-scaling step of a
    * training pipeline). Group stats are rounded to 6 dp BEFORE the
    * per-row z — aggregate fp accumulation order differs between engines,
    * and rounding the tiny stats table (not the big fact table) pins the
    * result bit-exactly with no precision the use case would miss.
    */
  def zscores(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"), col("event_type"), col("value"))
    val stats = e.groupBy(col("event_type")).agg(
      round(avg(col("value")), 6).as("mu"),
      round(stddev_samp(col("value")), 6).as("sigma"))
    // nullif: a constant group (sigma = 0) yields z = null instead of an
    // ANSI DIVIDE_BY_ZERO crash; the oracle mirrors with the same nullif
    e.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        round((col("value") - col("mu")) / nullif(col("sigma"), lit(0.0)), 4).as("z"))
      .orderBy(col("event_id"))
  }

  /** q51: daily event counts pivoted to one column per type. The pivot
    * values are EXPLICIT — without them Spark runs a values-discovery job
    * over the whole input before planning, which at 100 TB is a full
    * extra scan. Count cells for absent (day, type) combos coalesce to 0
    * (`pivot` yields null there; the oracle's CASE-sum yields 0).
    */
  def dailyTypePivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("day")).pivot("event_type", types).count()
      .select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("day"))
  }

  /** q52: revenue rollup over the region→nation hierarchy — subtotals per
    * region and a grand total in one pass (GROUPING SETS under the hood;
    * null group keys mark the subtotal rows, same convention as SQL
    * ROLLUP, so the oracle is a literal GROUP BY ROLLUP).
    */
  def revenueRollup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"),
      col("n_name"))
    val r = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** q68: CUBE over (region, order status) — all four grouping-set
    * combinations in one pass, with `grouping_id` disambiguating a real
    * NULL from a subtotal row (the reason `grouping_id` exists; NULLS
    * FIRST ordering alone couldn't distinguish them if the data had null
    * keys). Completes the grouping-sets family next to q51 pivot and q52
    * ROLLUP.
    */
  def revenueCube(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))
    val r = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .cube(col("r_name"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"),
        round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(col("r_name"), col("o_orderstatus"), col("gid"),
        col("revenue"), col("n_orders"))
      .orderBy(col("gid"), col("r_name").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
  }

  /** q54: the analytic-window suite per customer — lag/lead neighbors,
    * quartiles, percent_rank/cume_dist, first_value — all over one keyed
    * sort (the (price desc, orderkey) tie-break makes every function
    * deterministic).
    */
  def windowSuite(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .select(col("o_orderkey"), col("o_custkey"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"),
        first(col("o_orderkey")).over(w).as("top_order"))
      .orderBy(col("o_orderkey"))
  }

  /** q55: set-operation surface — INTERSECT/EXCEPT with SQL's distinct
    * semantics (customers who placed both an urgent and a low-priority
    * order but have no failed one).
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def buyers(p: String) =
      o.filter(col("o_orderpriority") === p).select(col("o_custkey")).distinct()
    val failed = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct()
    buyers("1-URGENT").intersect(buyers("5-LOW")).except(failed)
      .orderBy(col("o_custkey"))
  }

  /** q56: conditional-aggregate surface — count_if, bool_or, and
    * argmax/argmin with a composite (value, id) key: the testdata has
    * duplicate (type, value) pairs, so a bare max_by(id, value) would be
    * tie-ambiguous across engines.
    */
  def conditionalAggs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("count_if(value > 100.0)").as("n_high"),
        bool_or(col("value") > 500.0).as("any_extreme"),
        max_by(col("event_id"), struct(col("value"), col("event_id")))
          .as("max_value_event"),
        min_by(col("event_id"), struct(col("value"), col("event_id")))
          .as("min_value_event"))
      .orderBy(col("event_type"))

  /** q65: strictly-ordered funnel — users who viewed, then clicked at or
    * after their first view, then purchased at or after that first
    * qualifying click. Each stage anchors on the PREVIOUS stage's
    * timestamp (min-after-anchor), so out-of-order events never count —
    * the property a naive per-type EXISTS gets wrong.
    *
    * Plan shape: conditional mins over ONE user-keyed window (a null
    * anchor nulls the comparison, so a missing earlier stage disables
    * every later one — identical semantics to the three-join chain the
    * oracle states, which would shuffle the events table three times).
    * The per-user reduction rides the window's partitioning and the
    * final three counts are a scalar aggregate: one events shuffle plus
    * a single-row exchange, PlanSpec-pinned. No floats → exact compare.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("vt",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("ct",
        min(when(col("event_type") === "click" && col("ts") >= col("vt"),
          col("ts"))).over(w))
      .withColumn("pt",
        min(when(col("event_type") === "purchase" && col("ts") >= col("ct"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("vt")).as("vt"), max(col("ct")).as("ct"),
        max(col("pt")).as("pt"))
      .agg(count(col("vt")).as("n_viewed"),
        count(col("ct")).as("n_clicked_after_view"),
        count(col("pt")).as("n_full_funnel"))
  }

  /** q66: per-customer top-3 orders via the custom [[graft.functions.TopKLargest]]
    * Catalyst AGGREGATE — same answer as a row_number window (the oracle
    * states that formulation), radically different plan: ObjectHashAggregate
    * with map-side partial top-k, so the exchange carries ≤ k rows per
    * (group, mapper) and nothing ever sorts a whole group. The struct input
    * is (price, orderkey): lexicographic order = sort key + unique
    * tie-break, making the result total-ordered on both engines.
    */
  def topkAggregate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // The raised objectHashAggregate fallback threshold this aggregate wants
    // lives in [[graft.SessionDefaults]] — set at session construction, not
    // here, so no query mutates the shared session mid-run.
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(graft.functions.GraftFunctions.topk(
        struct(col("o_totalprice"), col("o_orderkey")), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("o_custkey"), (col("i") + 1).cast("long").as("rnk"),
        col("t.o_orderkey").as("o_orderkey"),
        round(col("t.o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** q71: unpivot/melt — the wide→long reshape (Spark's native `unpivot`,
    * which plans as an Expand, one output row per (input row, metric): no
    * join, no shuffle before the aggregate). Aggregated per (flag, metric)
    * so the driver compare stays small; the Expand feeds a partial
    * hash-aggregate, so the exchange carries 12 groups, not 4× the rows.
    */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "metric", "value")
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(round(sum(col("value")), 2).as("sum_value"),
        round(avg(col("value")), 4).as("avg_value"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("metric"))

  /** q72: pairwise Pearson correlations of the lineitem measures, long
    * format — ONE scan computes all six `corr` aggregates in a single
    * partial-aggregate pass (6 co-moment accumulators riding one
    * exchange), then the 1×6 row unpivots driver-side-free into
    * (col_a, col_b, corr) rows.
    */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"$a|$b")
    }
    Tables.lineitem(s, dir)
      .agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        pairs.map { case (a, b) => col(s"`$a|$b`") }.toArray,
        "pair", "corr")
      .select(
        split(col("pair"), "\\|").getItem(0).as("col_a"),
        split(col("pair"), "\\|").getItem(1).as("col_b"),
        col("corr"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** q76: first-order Markov transition matrix over each user's event
    * sequence — P(curr | prev) estimated from adjacent pairs, the
    * behavioral-sequence primitive (and the categorical twin of q62's
    * bigram LM). One user-keyed window pass produces the lag pairs; the
    * row-normalization is a window sum over the (tiny) transition-count
    * table, not a second scan.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("curr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy(col("prev"))).cast("double"), 4))
      .orderBy(col("prev"), col("curr"))
  }

  /** q77: robust outlier profile per event type — median, MAD (median
    * absolute deviation), and the count beyond the standard 3σ-equivalent
    * fence |v − med| > 3·1.4826·MAD. Median/MAD are the skew-proof
    * alternative to q49's mean/σ z-scores.
    *
    * Two aggregation passes by construction (MAD needs the median first);
    * both group tables are dimension-sized and broadcast back, so the
    * events table is scanned, never shuffled — the exact `percentile`
    * sorts only within each (small) group partition.
    */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withMed = e.join(broadcast(med), "event_type")
    val stats = withMed.groupBy(col("event_type"))
      .agg(first(col("med")).as("med"),
        expr("percentile(abs(value - med), 0.5)").as("mad"))
    withMed.drop("med").join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(round(first(col("med")), 4).as("median"),
        round(first(col("mad")), 4).as("mad"),
        sum(when(abs(col("value") - col("med")) > lit(4.4478) * col("mad"),
          1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** q78: ordered string aggregation (LISTAGG/string_agg) with BOUNDED
    * state — the top-3 customers by account balance per nation as one
    * comma-joined string. Reuses q66's [[graft.functions.TopKLargest]]
    * aggregate, so each mapper retains ≤ k structs per group and nothing
    * ever collects a whole group into memory — the collect_list +
    * array_sort + slice formulation would buffer every customer of a
    * nation on one reducer at 100 TB.
    */
  def topCustomerList(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // fallbackThreshold conf: see [[graft.SessionDefaults]] (session-level).
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        graft.functions.GraftFunctions.topk(
          struct(col("c_acctbal"), col("c_name")), 3).as("top"))
      .select(col("n_name"), col("n_customers"),
        array_join(transform(col("top"), x => x.getField("c_name")), ",")
          .as("top3"))
      .orderBy(col("n_name"))
  }

  /** q79: FULL OUTER join completing the join-type surface (inner/left/
    * semi/anti are q02-q06) — the per-customer orders-vs-events activity
    * reconciliation, where either side may be absent. The USING-style join
    * coalesces the key; presence flags read the pre-coalesce nulls.
    */
  def customerActivityFullOuter(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).groupBy(col("o_custkey").as("id"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("spend"))
    val e = Tables.events(s, dir).groupBy(col("user_id").as("id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("event_value"))
    o.join(e, Seq("id"), "full_outer")
      .select(col("id"),
        (col("n_orders").isNotNull && col("n_events").isNotNull).as("in_both"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("event_value"), lit(0.0)).as("event_value"))
      .orderBy(col("id"))
  }

  /** q81: arbitrary GROUPING SETS through the SQL surface — the asymmetric
    * set list ((nation, yr), (nation), (yr)) that neither ROLLUP (q52) nor
    * CUBE (q68) expresses, in ONE Expand pass with grouping_id
    * disambiguating the null rows.
    */
  def groupingSetsRevenue(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    Tables.customer(s, dir).createOrReplaceTempView("customer_gs")
    Tables.nation(s, dir).createOrReplaceTempView("nation_gs")
    s.sql("""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(grouping_id(n_name, year(o_orderdate)) AS BIGINT) AS gid,
        round(sum(o_totalprice), 2) AS revenue,
        count(*) AS n_orders
      FROM orders_gs
      JOIN customer_gs ON o_custkey = c_custkey
      JOIN nation_gs ON c_nationkey = n_nationkey
      GROUP BY n_name, year(o_orderdate)
        GROUPING SETS ((n_name, year(o_orderdate)), (n_name), (year(o_orderdate)))
      ORDER BY gid, nation NULLS FIRST, yr NULLS FIRST""")
  }

  /** q82: mergeable distinct-count sketches — the engine's OWN relational
    * HyperLogLog [Flajolet, Fuşy, Gandouet, Meunier, "HyperLogLog: the
    * analysis of a near-optimal cardinality estimation algorithm", AofA
    * 2007] with linear-counting small-range correction [Whang,
    * Vander-Zanden, Taylor, ACM TODS 15(2)]: the re-aggregatable
    * profiling primitive: per-type sketches built in one pass, then
    * UNIONED into the global estimate without rescanning the facts (the
    * property a plain approx_count_distinct, q31, lacks).
    *
    * Hash-verified since round 10 (was rows-only on DataSketches
    * `hll_sketch_agg`, whose xxhash64 internals DuckDB cannot replay):
    * the register build is `groupBy(type, bucket).max(rho)` — Spark's
    * map-side partial max IS the sketch merge (the q141 CountMin
    * argument) and the exchange is fixed-width (≤ |types|·1024 cells)
    * regardless of corpus size — and the hash is the quadratic-
    * congruential mixer over the Mersenne prime (the [[graft.functions
    * .VectorHash]] constants; a purely affine map would walk sequential
    * user_ids arithmetically through the bucket space, collide never,
    * and bias linear counting by +n²/2m — the measured q126
    * mixing-quality lesson). The harmonic sum is INTEGER
    * (Σ 2^(22−rho) + empty·2^22); the only float steps are one division
    * of the shared [[Hll.AlphaNum]] literal and, on the small-range
    * branch, m·ln(m/V) — whose rounded-integer outputs sit ≥ 0.04 from
    * the nearest half at every test SF (measured), so a 1-ulp
    * cross-libm `ln` difference cannot flip the BIGINT estimate.
    */
  def hllUserSketches(s: SparkSession, dir: String): DataFrame = {
    import Hll._
    val e = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"))
    val hashed = e
      .select(col("event_type"),
        ((lit(506952114L) * (((col("user_id") % P) + P) % P)
          + lit(1013904223L)) % P).as("m1"))
      .select(col("event_type"),
        ((lit(1566083941L) * ((col("m1") * col("m1")) % P) + col("m1")) % P)
          .as("h"))
    val w = shiftright(col("h"), 10)
    val rho = (lit(WBits + 1) - when(w === 0L, lit(0))
      .otherwise(length(bin(w)))).as("rho")
    val regs = hashed
      .select(col("event_type"), col("h").bitwiseAND(lit(1023L)).as("bucket"),
        rho)
      .groupBy(col("event_type"), col("bucket")).agg(max(col("rho")).as("reg"))
      .cache() // ≤ |types|·1024 rows; reused by the union sketch below
    // sketch UNION = register-wise max over the per-type sketch TABLE —
    // no second scan of events
    val allRegs = regs.groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
      .select(lit("__all__").as("event_type"), col("bucket"), col("reg"))
    val sk = regs.unionByName(allRegs)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("used"),
        expr("sum(shiftleft(CAST(1 AS BIGINT), 22 - reg))").as("s_part"))
    val est = sk
      .select(col("event_type"), col("used"),
        (lit(AlphaNum) / (col("s_part")
          + (lit(M.toLong) - col("used")) * lit(1L << 22)).cast("double"))
          .as("raw"))
      .select(col("event_type"),
        round(when(col("raw") <= lit(2.5 * M) && col("used") < M,
          lit(M.toDouble)
            * log(lit(M.toDouble) / (lit(M.toLong) - col("used"))
              .cast("double")))
          .otherwise(col("raw"))).cast("long").as("est_users"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .unionByName(e.agg(countDistinct(col("user_id")).as("exact_users"))
        .select(lit("__all__").as("event_type"), col("exact_users")))
    est.join(exact, Seq("event_type"))
      .select(col("event_type"), col("est_users"), col("exact_users"))
      .orderBy(col("event_type"))
  }

  /** q85: pointwise mutual information between event types that co-occur
    * in the same user's history — PMI = ln(n_ab·N / (n_a·n_b)) over the
    * per-user distinct type sets; the association metric behind word2vec-
    * style co-occurrence factorization, here on the categorical stream.
    *
    * Scale shape: the self-join is keyed by user and each user contributes
    * ≤ |type vocabulary| rows, so pair blow-up is bounded per key; the
    * marginals and the user count are dimension-sized broadcasts.
    */
  def eventTypePmi(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val nUsers = ut.select(countDistinct(col("user_id")).as("n_users"))
    val tc = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(tc.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(tc.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .withColumn("pmi", round(log(col("n_ab").cast("double") * col("n_users")
        / (col("n_a") * col("n_b")).cast("double")), 4))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("pmi"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** q87: per-nation ordinary-least-squares trend of order value over
    * time — `regr_slope`/`regr_intercept`/`regr_r2` of totalprice against
    * days-since-epoch-start. The OLS moments are algebraic aggregates
    * (sum, sum², cross-sum), so Spark computes them map-side-combined in
    * the same single shuffle as the count — per-group regression at 100 TB
    * costs exactly one grouped pass, never a per-group fit loop.
    */
  def nationRegression(s: SparkSession, dir: String): DataFrame = {
    val x = datediff(to_date(col("o_orderdate")),
      lit("1992-01-01").cast("date")).cast("double")
    val y = col("o_totalprice")
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n"),
        round(regr_slope(y, x), 4).as("slope"),
        round(regr_intercept(y, x), 2).as("intercept"),
        round(regr_r2(y, x), 6).as("r2"))
      .orderBy(col("nation"))
  }

  /** q88: deterministic per-group mode — the most frequent order priority
    * per market segment, ties broken by the smallest priority string.
    * Spark's built-in `mode()` is tie-arbitrary (hash-map iteration
    * order), so cross-engine determinism requires the count-then-rank
    * formulation; the rank window runs over the (segment × priority)
    * count table, which is dimension-sized however big the fact table is.
    */
  def modalPriority(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"))
    val best = Window.partitionBy(col("segment"))
      .orderBy(col("n").desc, col("priority"))
    counts.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("segment"), col("priority").as("mode_priority"), col("n"))
      .orderBy(col("segment"))
  }

  /** q89: exponentially-weighted moving average of the daily event volume
    * per event type — the classic smoothing primitive whose recursion
    * s_i = α·x_i + (1−α)·s_{i−1} SQL window frames can't express. The
    * fold runs as a higher-order `aggregate` over each type's day-ordered
    * series, seeded with the first observation (DuckDB's init-less
    * `list_reduce` mirrors that seeding exactly; the α/(1−α) coefficients
    * are spelled identically on both sides so the fp fold is bit-equal).
    *
    * State is bounded: `collect_list` holds one entry per (type, day) —
    * the calendar horizon, not the event count — so a 100 TB event table
    * still folds a few-thousand-element array per type.
    */
  def ewmaDailyEvents(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("xs"),
        count(lit(1)).as("n_days"), max(col("day")).as("last_day"))
      .select(col("event_type"), col("n_days"), col("last_day"),
        round(aggregate(
          expr("slice(xs, 2, size(xs) - 1)"),
          element_at(col("xs"), 1).getField("n").cast("double"),
          (acc, x) => lit(0.3) * x.getField("n").cast("double")
            + lit(0.7) * acc), 6).as("ewma"))
      .orderBy(col("event_type"))
  }

  /** q90: equi-width histogram of order values over a FIXED grid
    * ([0, 600k) in 24 buckets) — fixed bounds keep the bucket function a
    * pure per-row expression (no min/max pre-scan) and make histograms
    * from different data slices directly addable. The bucket-id grid is
    * generated and left-joined so empty buckets surface as explicit
    * zeros; the grid side is 24 rows, broadcast by construction.
    */
  def priceHistogram(s: SparkSession, dir: String): DataFrame = {
    val width = 25000.0
    val counts = Tables.orders(s, dir)
      .select(least(floor(col("o_totalprice") / lit(width)), lit(23L))
        .cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    s.range(24).toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (col("bucket") * lit(width)).as("lo"),
        ((col("bucket") + 1) * lit(width)).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Pareto frontier (skyline) per group: the distinct (cost, benefit)
    * profiles not dominated by any other (lower-or-equal cost AND
    * higher-or-equal benefit, one strict). On DISTINCT profiles sorted by
    * (cost asc, benefit desc), a row is dominated iff some EARLIER row has
    * benefit ≥ its own — so one running-max window over the group replaces
    * the quadratic dominance self-join, and the distinct-profile
    * restriction is what makes that single-pass test exact (equal-profile
    * duplicates would otherwise shadow each other despite neither
    * dominating).
    */
  def paretoFrontier(rows: DataFrame, groupCol: String, costCol: String,
      benefitCol: String): DataFrame = {
    val prof = rows.select(col(groupCol), col(costCol), col(benefitCol))
      .distinct()
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(costCol).asc, col(benefitCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    prof.withColumn("__pm", max(col(benefitCol)).over(w))
      .filter(col("__pm").isNull || col("__pm") < col(benefitCol))
      .drop("__pm")
  }

  /** q91: the price-vs-size Pareto frontier of the part catalog per brand
    * — "no cheaper part of this brand is at least as large".
    */
  def partFrontier(s: SparkSession, dir: String): DataFrame =
    paretoFrontier(Tables.part(s, dir), "p_brand", "p_retailprice", "p_size")
      .select(col("p_brand").as("brand"), col("p_retailprice").as("price"),
        col("p_size").as("part_size"))
      .orderBy(col("brand"), col("price"), col("part_size"))

  /** q97: χ² independence test between event type and the acting
    * customer's market segment — "does behavior depend on segment?", the
    * categorical-association significance primitive (q85's PMI measures
    * per-pair strength; χ² tests the whole table).
    *
    * One fact-table pass builds the contingency cells; every marginal
    * (row totals, column totals, grand total) is a window over the
    * CELL table, which is |types|×|segments| rows no matter how many
    * events exist — the statistic costs one grouped aggregate at any
    * scale.
    */
  def chiSquareSegments(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"))
      .join(Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment")), "user_id")
      .groupBy(col("event_type"), col("segment"))
      .agg(count(lit(1)).as("o"))
    val byType = Window.partitionBy(col("event_type"))
    val bySeg = Window.partitionBy(col("segment"))
    val all = Window.partitionBy()
    cells
      .withColumn("row_tot", sum(col("o")).over(byType))
      .withColumn("col_tot", sum(col("o")).over(bySeg))
      .withColumn("n", sum(col("o")).over(all))
      .withColumn("e", (col("row_tot") * col("col_tot")).cast("double")
        / col("n").cast("double"))
      .agg(
        round(sum(pow(col("o").cast("double") - col("e"), 2) / col("e")), 4)
          .as("chi2"),
        ((countDistinct(col("event_type")) - 1)
          * (countDistinct(col("segment")) - 1)).as("dof"),
        max(col("n")).as("n"))
  }

  /** q98: Gini coefficient of customer spend —
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending-ranked spend.
    *
    * The global rank is built WITHOUT a global single-partition window:
    * per-customer spend rows land in explicit value-range buckets, rank
    * within each bucket rides a bucket-keyed window, and each bucket's
    * offset comes from the (bucket → count) prefix table — 25 rows,
    * broadcast. That is the zipWithIndex pattern expressed in DataFrame
    * operators: total order at scale with only a bucket-keyed exchange.
    * The oracle states the same ranking as one plain window — the
    * bucketed construction is semantics-neutral by design.
    *
    * Spend is rounded to cents BEFORE ranking on both sides, so rank
    * order (and therefore Σ i·xᵢ) cannot depend on engine-specific sum
    * bits.
    */
  /** Gini over a per-entity (id, x) table; `bucketW`/`maxBucket` define
    * the value-range buckets the distributed ranking rides on (bucket
    * choice affects only load balance, never the result).
    */
  def gini(perEntity: DataFrame, bucketW: Double, maxBucket: Long): DataFrame = {
    val bucketed = perEntity
      .withColumn("b", least(floor(col("x") / lit(bucketW)), lit(maxBucket))
        .cast("long"))
    // bucket prefix counts: maxBucket+1 rows however large the entity set is
    val prefix = bucketed.groupBy(col("b")).agg(count(lit(1)).as("c"))
      .withColumn("offset",
        coalesce(sum(col("c")).over(
          Window.orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("offset"))
    val inBucket = Window.partitionBy(col("b")).orderBy(col("x"), col("id"))
    bucketed
      .withColumn("r", row_number().over(inBucket))
      .join(broadcast(prefix), "b")
      .withColumn("i", col("r") + col("offset"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("x")), 2).as("total_spend"),
        round(lit(2.0) * sum(col("i") * col("x"))
          / (count(lit(1)) * sum(col("x")))
          - (count(lit(1)) + 1).cast("double") / count(lit(1)), 6)
          .as("gini"))
  }

  def giniSpend(s: SparkSession, dir: String): DataFrame =
    gini(
      Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("id"))
        .agg(round(sum(col("o_totalprice")), 2).as("x")),
      bucketW = 200000.0, // per-customer spend sits in ~[0, 5M) at any SF
      maxBucket = 24L)

  def sentimentByLang(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .select(col("lang"), graft.functions.GraftFunctions.sentiment(col("text")).as("score"))
      .withColumn("label", Sentiment.label(col("score")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("score")), 4).as("avg_sentiment"),
        sum(when(col("label") === "positive", 1L).otherwise(0L)).as("n_positive"),
        sum(when(col("label") === "negative", 1L).otherwise(0L)).as("n_negative"))
      .orderBy(col("lang"))
  }
}

/** q82 HyperLogLog constants, shared with the DuckDB oracle mirror (the
  * OracleSqlHelpers interpolation discipline: one definition, two engines,
  * no drift). Mixer multipliers are the [[graft.functions.VectorHash]]
  * family — every intermediate stays under 2⁶³ (A·x < 1.1e18,
  * m₁² < P² ≈ 4.6e18), so Spark longs and DuckDB BIGINTs agree for any
  * 64-bit user_id after the floor-mod reduction.
  */
object Hll {
  /** 2³¹ − 1 (Mersenne), the q141 modulus. */
  val P: Long = 2147483647L
  /** Registers (10 bucket bits); rsd ≈ 1.04/√m ≈ 3.2%. */
  val M: Int = 1024
  /** Width of the rho window: (P−1) >> 10 < 2²¹, so rho ∈ [1, 22]. */
  val WBits: Int = 21
  /** α₁₀₂₄ · m² · 2²² — the raw-estimate numerator. The oracle embeds
    * `Double.toString(AlphaNum)` (shortest-roundtrip decimal), so both
    * engines divide the SAME double by the integer harmonic sum.
    */
  val AlphaNum: Double =
    0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 * 4194304.0
}
