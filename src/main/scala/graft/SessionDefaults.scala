package graft

import org.apache.spark.sql.SparkSession

/** Engine-level session confs applied at every session-construction site
  * (Verify / Bench / Explain / Profile / the test base). Centralized here so
  * no query function mutates the shared session mid-run — a conf set inside
  * one query would silently leak into every query benched after it.
  *
  * Queries must stay CORRECT without these (the driver's smoke runs a
  * vanilla session); they are performance defaults only.
  */
object SessionDefaults {
  val confs: Map[String, String] = Map(
    // ObjectHashAggregate abandons hashing after 128 distinct groups by
    // default and sorts instead — far too conservative for the bounded
    // top-k aggregate buffers (q66/q78: ≤ k tiny structs per group;
    // 64k groups × 3 × ~24 B ≈ 4 MB per task). The fallback still exists
    // above this for genuinely unbounded group cardinality per mapper.
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "65536")

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    confs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
