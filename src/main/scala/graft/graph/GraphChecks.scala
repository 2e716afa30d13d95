package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-integrity checks — the engine's equivalents of the reference's
  * Cypher test suite (`test_cases/neo4j_test.cypher:1-47`), each a small
  * anti-join or grouped-count DataFrame that must come back empty (or a
  * summary table for dashboards).
  */
object GraphChecks {

  /** Keys appearing more than once (uniqueness constraint,
    * `neo4j_test.cypher:2-5`, `graph.cypher:11-19`). Empty = pass.
    */
  def duplicateKeys(nodes: DataFrame, key: String = "id"): DataFrame =
    nodes.groupBy(col(key)).count().filter(col("count") > 1)

  /** Edges whose src has no node (referential completeness via
    * anti-pattern, `neo4j_test.cypher:7-15`). Empty = pass.
    */
  def orphanEdgesBySrc(edges: DataFrame, nodes: DataFrame): DataFrame =
    edges.join(nodes.select(col("id")), edges("src") === nodes("id"), "left_anti")

  /** Edges whose dst has no node (`neo4j_test.cypher:17-37`). Empty = pass. */
  def orphanEdgesByDst(edges: DataFrame, nodes: DataFrame): DataFrame =
    edges.join(nodes.select(col("id")), edges("dst") === nodes("id"), "left_anti")

  /** Stored `friend_count` vs actual FRIENDS_WITH degree
    * (`neo4j_test.cypher:39-44`). Returns rows that disagree; empty = pass.
    */
  def friendCountMismatch(users: DataFrame, friendsWith: DataFrame): DataFrame = {
    val degree = friendsWith.groupBy(col("src")).agg(count(lit(1)).as("actual_degree"))
    users.select(col("user_id"), col("friend_count")).dropDuplicates("user_id")
      .join(degree, users("user_id") === degree("src"), "left")
      .withColumn("actual_degree", coalesce(col("actual_degree"), lit(0L)))
      .filter(col("friend_count").cast("long") =!= col("actual_degree"))
      .select(col("user_id"), col("friend_count"), col("actual_degree"))
  }

  /** Top-k reviewers of a named business — the reference's one end-to-end
    * analytic Cypher (`neo4j_test.cypher:49-53`): two-hop inner join with a
    * literal filter, global top-k (TakeOrderedAndProject, no full sort).
    */
  def topReviewersOf(
      users: DataFrame, wrote: DataFrame, reviews: DataFrame,
      reviewNodes: DataFrame, businessNodes: DataFrame,
      businessName: String, k: Int = 5): DataFrame = {
    val biz = businessNodes.filter(col("name") === businessName)
      .select(col("id").as("biz_id"))
    reviews.join(broadcast(biz), reviews("dst") === col("biz_id"))
      .select(reviews("src").as("review_id"))
      .join(reviewNodes.select(col("id"), col("stars")),
        col("review_id") === reviewNodes("id"))
      .join(wrote.select(col("src").as("writer_id"), col("dst").as("w_review")),
        col("review_id") === col("w_review"))
      .join(users.select(col("id").as("uid"), col("name").as("user_name")),
        col("writer_id") === col("uid"))
      .select(col("user_name"), col("stars"))
      .orderBy(col("stars").desc, col("user_name"))
      .limit(k)
  }
}
