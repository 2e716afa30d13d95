package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** The repo's executable README: every lifecycle demo in one command.
  *
  * Runs the five self-asserting mains in sequence — YelpDemo (raw JSON →
  * domain ETLs → unified table → graph + integrity), CorpusDemo
  * (quality gate → dedup tiers → split), StreamDemo (file drops →
  * AvailableNow sessionizer → MERGE snapshot sink → vacuum), LayoutDemo
  * (quarantine → align → compact → z-order → repair/replay),
  * ExperimentDemo (CUPED → uplift → stratified ATE → DiD → jackknife →
  * rank-sum → KM/log-rank → CUSUM → release funnel) — each in its own
  * SparkSession lifecycle, exactly as a user would run them.
  * Every demo asserts its own claims, so reaching the end IS the proof;
  * the final cross-demo assertion then re-opens YelpDemo's persisted
  * unified output with a FRESH session and checks it round-trips —
  * artifacts one stage wrote remain readable by a later, unrelated
  * session (the handoff every multi-stage deployment depends on).
  *
  * Run: `sbt "runMain graft.examples.AllDemos"` — exits 0 only if every
  * assert in all four demos and the cross-check holds.
  */
object AllDemos {
  def main(args: Array[String]): Unit = {
    val yelpWork = Files.createTempDirectory("graft-all-demos").toString

    println("=== 1/5 YelpDemo ===")
    YelpDemo.main(Array(yelpWork))
    println("=== 2/5 CorpusDemo ===")
    CorpusDemo.main(Array.empty)
    println("=== 3/5 StreamDemo ===")
    StreamDemo.main(Array.empty)
    println("=== 4/5 LayoutDemo ===")
    LayoutDemo.main(Array.empty)
    println("=== 5/5 ExperimentDemo ===")
    ExperimentDemo.main(Array.empty)

    // cross-demo: a fresh session (the demos stopped theirs) re-reads the
    // unified table YelpDemo persisted four stages ago
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val uni = spark.read.parquet(s"$yelpWork/out/unified_analytics")
    assert(uni.count() == 2, s"unified round-trip lost rows: ${uni.count()}")
    assert(uni.columns.contains("review_id")
        && uni.columns.exists(_.endsWith("name")), // overlap-renamed dims
      s"unified round-trip lost columns: ${uni.columns.mkString(",")}")
    spark.stop()
    println("ALL DEMOS PASSED (5 lifecycles + cross-demo round-trip)")
  }
}
