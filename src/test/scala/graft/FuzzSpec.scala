package graft

import org.apache.spark.sql.functions._

/** Engine-side half of the differential fuzz harness
  * ([[graft.tools.Fuzz]]): the DuckDB replay (`tools/fuzz_diff.py`, 20
  * seeds × 11 families, archived in FUZZ_r11.json) is the cross-engine
  * leg; this spec holds the legs that don't need a second engine —
  *
  *   - generator determinism (a fuzz harness whose corpora aren't
  *     reproducible can't pin a found divergence as a regression case);
  *   - boundary coverage floors (the generator's entire value is its
  *     concentration on the cut/tolerance/tie edges — if a refactor
  *     dilutes that, the harness keeps "passing" while testing nothing);
  *   - the sessionization TRIPLE PARITY on every corpus: q45 (window
  *     lag/running-sum), q122 (typed flatMapGroups state machine) and
  *     q149 (Spark's native session_window) are three independent
  *     implementations of the same `diff > gap` cut rule, and on every
  *     generated corpus all three must agree on the session set.
  */
class FuzzSpec extends SparkSpec {

  import graft.tools.Fuzz

  private val seeds = Seq(0, 7, 19)

  test("generator is seed-deterministic and seed-sensitive") {
    val a = Fuzz.genEvents(spark, 5).collect().toSeq
    val b = Fuzz.genEvents(spark, 5).collect().toSeq
    assert(a == b, "same seed must reproduce the identical events corpus")
    val c = Fuzz.genEvents(spark, 6).collect().toSeq
    assert(a != c, "different seeds must differ")
    val oa = Fuzz.genOrders(spark, 5).collect().toSeq
    val ob = Fuzz.genOrders(spark, 5).collect().toSeq
    assert(oa == ob, "same seed must reproduce the identical orders corpus")
  }

  test("corpora stay boundary-concentrated") {
    val gapUs = 30L * 60L * 1000000L
    val e = Fuzz.genEvents(spark, 0)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val d = e.withColumn("d", col("t") - lag(col("t"), 1).over(w))
    def n(cond: org.apache.spark.sql.Column): Long = d.filter(cond).count()
    assert(n(col("d") === gapUs) > 50, "exact-gap increments must be dense")
    assert(n(col("d") === gapUs + 1L) > 20, "gap+1µs increments must exist")
    assert(n(col("d") === 0L) > 20, "duplicate timestamps must exist")
    val o = Fuzz.genOrders(spark, 0)
    val lattice = o.as("a").join(o.as("b"),
      col("a.o_custkey") === col("b.o_custkey") &&
        col("b.o_orderdate") === col("a.o_orderdate") + expr("INTERVAL 7 DAYS") &&
        col("a.o_orderkey") < col("b.o_orderkey")).count()
    assert(lattice > 5, "exact 7-day interval-lattice pairs must exist")
    assert(o.filter(to_date(col("o_orderdate")) < lit("1998-06-01").cast("date"))
      .count() > 20, "q104's snapshot cut must split the corpus")
  }

  test("sessionization triple parity holds on every fuzz corpus") {
    for (seed <- seeds) {
      val dir = s"/tmp/graft-fuzz-spec/s$seed"
      Fuzz.writeCorpus(spark, seed, dir)
      val q45 = graft.analytics.CoreQueries.eventSessions(spark, dir)
        .select("user_id", "session_id", "n_events", "start_us", "end_us",
          "duration_sec").collect().toSet
      val q122 = graft.stream.Sessionize.typedSessionsQuery(spark, dir)
        .select("user_id", "session_id", "n_events", "start_us", "end_us",
          "duration_sec").collect().toSet
      assert(q45 == q122, s"seed $seed: window-lag vs typed state machine")
      val q149 = graft.stream.WindowedAggs.sessionWindowQuery(spark, dir)
        .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
          col("n_events")).collect().toSet
      val q45k = graft.analytics.CoreQueries.eventSessions(spark, dir)
        .select(col("user_id"), col("start_us"), col("n_events"))
        .collect().toSet
      assert(q45k == q149, s"seed $seed: window-lag vs native session_window")
      spark.catalog.clearCache()
    }
  }

  test("the seed-3 q199 round-boundary find stays pinned: the adjusted " +
    "ATE lands EXACTLY on a shortest-string half grid, where Spark and " +
    "DuckDB round() legitimately part") {
    // The round-11 64-family sweep's single divergence (found at
    // 1279/1280, then FIXED): the unrounded quotient's binary value is
    // 155.733749999999986..., BELOW the 4-dp half — but its SHORTEST
    // decimal string is "155.73375". Spark's round() rounds the
    // shortest-string decimal (HALF_UP → 155.7338); DuckDB's rounds the
    // (approximate) exact value (→ 155.7337). Neither engine is wrong;
    // they implement different round semantics that differ only on this
    // knife edge. The q199 oracle now replicates Spark's semantics via a
    // VARCHAR→DECIMAL round-trip (re-swept 20/20); this pin reproduces
    // the CONDITION so the find and its analysis cannot silently rot.
    val dir = "/tmp/graft-fuzz-spec/s3-pin"
    Fuzz.genEvents(spark, 3).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val cutoff = lit("2024-01-16").cast("timestamp")
    val units = events.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("ts") < cutoff, 1L)), lit(0L)).as("score"),
        coalesce(sum(when(col("ts") >= cutoff,
          round(col("value") * 100).cast("long"))), lit(0L)).as("cents"))
      .select(col("user_id").as("unit_id"), col("score"),
        (col("user_id") % 2L === 1L).as("treated"), col("cents"))
    val cells = graft.analytics.Uplift.withDeciles(units)
      .groupBy(col("decile"))
      .agg(coalesce(sum(when(col("treated"), 1L)), lit(0L)).as("n_t"),
        coalesce(sum(when(col("treated"),
          col("cents").cast("decimal(38,0)"))),
          lit(0L).cast("decimal(38,0)")).as("s_t"),
        coalesce(sum(when(!col("treated"), 1L)), lit(0L)).as("n_c"),
        coalesce(sum(when(!col("treated"),
          col("cents").cast("decimal(38,0)"))),
          lit(0L).cast("decimal(38,0)")).as("s_c"))
      .filter(col("n_t") > 0L && col("n_c") > 0L)
      .collect().sortBy(_.getLong(0))
    var (swg, ns) = (0.0, 0.0)
    cells.foreach { r =>
      val nt = r.getLong(1); val st = r.getDecimal(2).doubleValue
      val nc = r.getLong(3); val sc = r.getDecimal(4).doubleValue
      swg += (nt + nc).toDouble * (st / nt - sc / nc)
      ns += (nt + nc).toDouble
    }
    val unrounded = swg / ns / 100.0
    // the shortest string terminates on the 4-dp half grid...
    assert(java.lang.Double.toString(unrounded) === "155.73375")
    // ...while the exact binary value sits BELOW it
    assert(new java.math.BigDecimal(unrounded)
      .compareTo(new java.math.BigDecimal("155.73375")) < 0)
  }

  test("spatial corpus stays boundary-concentrated: offsets straddle the " +
    "radius cut tightly, homes sit on cell corners, keys are unique") {
    val keys = Fuzz.genCustomer(spark, 0).collect().map(_.getLong(0))
    assert(keys.length == keys.distinct.length, "c_custkey must be unique")
    // the two straddling residues of the mod-401 offset lattice: 91 →
    // dist² 39978 (inside r²=40000), 126 → 40042 (outside)
    assert(keys.count(_ % 401L == 91L) > 30, "just-inside offsets must be dense")
    assert(keys.count(_ % 401L == 126L) > 30, "just-outside offsets must be dense")
    val d2 = (k: Long) => {
      val dx = (k * 48271L) % 401L - 200L; val dy = (k * 16807L) % 401L - 200L
      dx * dx + dy * dy
    }
    assert(keys.filter(_ % 401L == 91L).forall(d2(_) == 39978L))
    assert(keys.filter(_ % 401L == 126L).forall(d2(_) == 40042L))
    // cell-corner homes: k ≡ 0 (mod 256) puts BOTH hash coordinates on a
    // multiple of 256 (odd multipliers preserve the 2-adic valuation)
    assert(keys.count(_ % 256L == 0L) > 15, "cell-corner homes must exist")
    assert(keys.exists(_ > 1000000000L), "big-modulus keys must exist")
  }
}
