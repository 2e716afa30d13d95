package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end Yelp-shaped pipeline: three domain ETLs + the unified join
  * (reference DAG: `README.md:142-152`, `join/unified_data_analytics.py`).
  *
  * The unified table is review-grain: `review ⟕ user ON user_id ⟕ business
  * ON business_id`, with colliding non-key columns prefixed `review_` /
  * `business_` by the runtime overlap rule (UnifiedJoin). The user and
  * business sides are deduplicated to one row per key first — the domain
  * outputs are fan-out tables (per-friend / per-category rows), and joining
  * them at that grain would multiply review rows.
  *
  * Scale: review is the fact side (~7M rows in real Yelp); user/business are
  * dim-sized after dedup. Catalyst/AQE broadcasts them when under the
  * threshold; at 100 TB the joins shuffle on user_id then business_id, both
  * fine since the fact side dominates and the keys are high-cardinality.
  */
object YelpPipeline {

  /** One row per user (drop the per-friend fan-out for joining). */
  def userDim(users: DataFrame): DataFrame =
    users.drop("friend").dropDuplicates("user_id")

  /** One row per business: drop the per-category fan-out, re-aggregate the
    * category list into a single comma-joined string column (flat output).
    */
  def businessDim(businesses: DataFrame): DataFrame = {
    val perBiz = businesses.drop("category").dropDuplicates("business_id")
    val cats = businesses.groupBy(col("business_id"))
      .agg(concat_ws(", ", sort_array(collect_set(col("category")))).as("categories"))
    perBiz.join(cats, Seq("business_id"), "left")
  }

  def unified(reviews: DataFrame, users: DataFrame, businesses: DataFrame): DataFrame =
    UnifiedJoin.unify(
      reviews, userDim(users), businessDim(businesses),
      key1 = "user_id", key2 = "business_id",
      factPrefix = "review", dim2Prefix = "business")

  /** Full run from raw JSON dirs; domain outputs appended, unified table
    * overwritten (the reference's incremental-append / full-recompute split,
    * `README.md:217-223`).
    *
    * WARNING — reference-parity behavior: re-running over the SAME input
    * files appends duplicate rows (the reference's append-duplication trap,
    * SURVEY.md §7.4). For at-least-once delivery use the checkpointed
    * streaming path ([[graft.stream.Ingest]]), whose file index makes
    * re-delivery a no-op; this batch entry point deliberately mirrors the
    * reference's run-once contract.
    */
  def run(
      spark: SparkSession,
      businessJson: String, reviewJson: String, userJson: String,
      outDir: String, asOf: Timestamp): DataFrame = {
    val b = BusinessEtl.fromJson(spark, businessJson)
    val r = ReviewEtl.fromJson(spark, reviewJson)
    val u = UserEtl.fromJson(spark, userJson, asOf)
    b.write.mode("append").parquet(s"$outDir/business_processed")
    r.write.mode("append").parquet(s"$outDir/review_processed")
    u.write.mode("append").parquet(s"$outDir/user_processed")
    val uni = unified(
      spark.read.parquet(s"$outDir/review_processed"),
      spark.read.parquet(s"$outDir/user_processed"),
      spark.read.parquet(s"$outDir/business_processed"))
    uni.write.mode("overwrite").parquet(s"$outDir/unified_analytics")
    spark.read.parquet(s"$outDir/unified_analytics")
  }
}
