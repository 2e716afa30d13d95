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

  /** Silence the one warning proven benign, keeping everything else at WARN.
    *
    * Exactly 17 queries own an empty-partition-key window in their OPTIMIZED
    * plan (closed membership + an 8192-row runtime input bound, both pinned
    * by WindowAuditSpec) — every one a dimension-sized frame by construction.
    * Spark's `WindowExec` logs "No Partition Defined for Window operation!"
    * per task for each of them, which saturates the ~2 KB stdout tail the
    * bench driver archives and buries Bench's compact JSON line (BENCH_r13/
    * r14 both recorded `parsed: null` for this reason). The logger for the
    * window-exec package alone goes to ERROR; a NEW unbounded global window
    * is still caught — by the audit spec, which fails the build.
    *
    * Call AFTER `sparkContext.setLogLevel(...)`: that call rewrites the root
    * logger level, and this per-package override must layer on top of it.
    */
  def silenceProvenBenignWarnings(): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    // GraftFunctions.register is idempotent by design (same function
    // objects every call), but SimpleFunctionRegistry logs a "replaced a
    // previously registered function" WARN per name per re-registration —
    // five lines that eat ~40% of the ~2 KB stdout tail the bench driver
    // archives (the round-15 verdict flagged the shrinking margin).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry",
      org.apache.logging.log4j.Level.ERROR)
  }
}
