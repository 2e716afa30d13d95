package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Property-graph projection of the processed Yelp tables — node/edge
  * DataFrames in the GraphFrames convention (`id` for vertices, `src`/`dst`
  * for edges), replacing the reference's CSV→Cypher load
  * (`neo4j_load/graph.cypher:22-97`).
  *
  * MERGE semantics (idempotent re-ingest, `graph.cypher:24,38,52` and
  * `README.md:372`) become `dropDuplicates` on the key at projection time —
  * re-running over appended batches never duplicates a node or edge.
  *
  * Scale: every projection is select + dropDuplicates (one hash-aggregate
  * shuffle on the key). The friendship closure doubles edge rows before
  * dedup; at real-Yelp scale that's hundreds of millions of rows
  * (SURVEY.md §7.4 "explode blow-up") — high-cardinality keys, AQE handles
  * partition sizing, nothing collects to the driver.
  */
object GraphExport {

  /** Node tables keyed `id`, one per label (`graph.cypher:22-68`). */
  def businessNodes(b: DataFrame): DataFrame =
    b.select(col("business_id").as("id"), col("name"), col("latitude"),
        col("longitude"), col("stars"), col("review_count"),
        col("business_accepts_credit_cards").as("accepts_credit_cards"),
        col("noise_level"))
      .dropDuplicates("id")

  def userNodes(u: DataFrame): DataFrame =
    u.select(col("user_id").as("id"), col("name"), col("fans"),
        col("elite_years_count"), col("engagement_compliments"))
      .dropDuplicates("id")

  def reviewNodes(r: DataFrame): DataFrame =
    r.select(col("review_id").as("id"), col("stars"), col("date"),
        col("sentiment_label"))
      .dropDuplicates("id")

  def cityNodes(b: DataFrame): DataFrame =
    b.select(col("city").as("id")).filter(col("id").isNotNull).dropDuplicates("id")

  def stateNodes(b: DataFrame): DataFrame =
    b.select(col("state").as("id")).filter(col("id").isNotNull).dropDuplicates("id")

  def categoryNodes(b: DataFrame): DataFrame =
    b.select(col("category").as("id")).filter(col("id").isNotNull).dropDuplicates("id")

  /** The boolean amenity flags of the processed business table — the
    * engine's `business_feature` feed (the reference ships it as a CSV,
    * `graph.cypher:6,83-90`; its rows are the amenities a business offers).
    */
  val featureFlags: Seq[String] =
    graft.etl.Schemas.booleanAttrs.map(graft.etl.BusinessEtl.toSnake) ++
      Seq("ambience_casual", "ambience_classy", "parking_lot", "parking_garage")

  /** (business_id, feature) rows — one per amenity flag that is true.
    * Single narrow pass: the per-flag `when`s land in one array that is
    * exploded once (no per-flag scans), nulls (false/missing flags)
    * filtered after the generate.
    */
  def businessFeatures(b: DataFrame, flags: Seq[String] = featureFlags): DataFrame =
    b.select(col("business_id"),
        explode(array(flags.map(f => when(col(f) === true, lit(f))): _*)).as("feature"))
      .filter(col("feature").isNotNull)
      .dropDuplicates("business_id", "feature")

  /** Feature lookup nodes (`graph.cypher:19,86` — unique names). */
  def featureNodes(b: DataFrame, flags: Seq[String] = featureFlags): DataFrame =
    businessFeatures(b, flags).select(col("feature").as("id")).dropDuplicates("id")

  /** Edge tables (src, dst[, props]), one per relationship type
    * (`graph.cypher:50-97`).
    */
  def wrote(r: DataFrame): DataFrame =
    r.select(col("user_id").as("src"), col("review_id").as("dst"))
      .dropDuplicates("src", "dst")

  def reviews(r: DataFrame): DataFrame =
    r.select(col("review_id").as("src"), col("business_id").as("dst"))
      .dropDuplicates("src", "dst")

  def locatedIn(b: DataFrame): DataFrame =
    b.select(col("business_id").as("src"), col("city").as("dst"))
      .filter(col("dst").isNotNull).dropDuplicates("src", "dst")

  def inState(b: DataFrame): DataFrame =
    b.select(col("city").as("src"), col("state").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .dropDuplicates("src", "dst")

  def hasCategory(b: DataFrame): DataFrame =
    b.select(col("business_id").as("src"), col("category").as("dst"))
      .filter(col("dst").isNotNull).dropDuplicates("src", "dst")

  /** (b)-[:OFFERS]->(f) edges (`graph.cypher:85-86`). */
  def offers(b: DataFrame, flags: Seq[String] = featureFlags): DataFrame =
    businessFeatures(b, flags)
      .select(col("business_id").as("src"), col("feature").as("dst"))

  /** Bidirectional FRIENDS_WITH closure (`graph.cypher:93-95`): union with
    * reversed endpoints, deduped; self-loops and null friends dropped.
    */
  def friendsWith(u: DataFrame): DataFrame = {
    val e = u.select(col("user_id").as("src"), col("friend").as("dst"))
      .filter(col("dst").isNotNull && col("dst") =!= "" && col("src") =!= col("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
  }

  /** CSV export of any node/edge table (`graph.cypher:5` feed format). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Schema-typed CSV scan — the library side of the round-trip (S6):
    * `LOAD CSV WITH HEADERS` plus the Cypher `toFloat`/`toInteger`/`date()`
    * coercions (`graph.cypher:23,27-29,40-43`) become an explicit schema,
    * so typing happens in the scan (pushed into the CSV reader), not in a
    * post-pass.
    */
  def importCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}
