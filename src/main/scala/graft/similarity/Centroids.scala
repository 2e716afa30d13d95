package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed class-centroid computation + inter-class cosine similarity
  * matrix — the "how close are my data slices in embedding space" audit
  * that drives mixture and dedup decisions (e.g. SemDeDup's cluster
  * diagnostics, arXiv:2303.09540 §4; nearest-class-mean classification,
  * Mensink et al., ECCV'12).
  *
  * Reference tie: the clustering row of the reference's ML feature surface
  * (/root/reference/README.md:321-336) — the per-group vector summary the
  * reference delegates to Databricks ML, as a native aggregation.
  *
  * 100 TB shape: the vector average never materializes per-group arrays on
  * the shuffle — `posexplode` turns (label, vec[d]) into d narrow rows and
  * the component mean partial-aggregates map-side keyed on (label, dim), so
  * the exchange carries one row per (label, dim) REGARDLESS of corpus size.
  * The reassembled centroid table is dimension-sized (|labels| rows);
  * the pairwise cosine is a broadcast self-join over it. Centroid
  * components round to 6 decimals before the cosine so the DuckDB oracle
  * sees bit-identical inputs, and the dot/norm fold runs in index order on
  * both sides.
  */
object Centroids {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** (label, dim, c) component means — the distributed half. */
  def componentMeans(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("v").cast("double")), 6).as("c"))

  /** Upper-triangle cosine similarity matrix between per-label centroids:
    * (label_a, label_b, cos_sim).
    */
  def labelCentroidMatrix(embeddings: DataFrame): DataFrame = {
    val centroids = componentMeans(embeddings)
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("parts"))
      .select(col("label"),
        transform(col("parts"), p => p.getField("c")).as("centroid"))
    val a = centroids.select(col("label").as("label_a"), col("centroid").as("ca"))
    val b = centroids.select(col("label").as("label_b"), col("centroid").as("cb"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        round(dot(col("ca"), col("cb"))
          / (sqrt(dot(col("ca"), col("ca"))) * sqrt(dot(col("cb"), col("cb")))),
          6).as("cos_sim"))
      .orderBy(col("label_a"), col("label_b"))
  }

  def labelCentroidMatrixQuery(s: SparkSession, dir: String): DataFrame =
    labelCentroidMatrix(Tables.embeddings(s, dir))
}
