package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Spatial

/** Scaling probe for the grid-blocked radius join (q159): separates the
  * OPERATOR's scaling from the PROBLEM's.
  *
  * The q159 fixture scatters points over a FIXED 65536² domain, so at
  * K× customers the density — and with it the true within-r pair count,
  * i.e. the output itself — grows ~K²·(per-point α): a radius query on
  * K×-denser data IS a K²-bigger problem, whatever engine runs it. The
  * honest scaling leg for the operator therefore holds DENSITY constant:
  * scale the domain side by √K so K× points occupy K× area. This probe
  * runs both legs on any sf directory:
  *
  *   sbt "runMain graft.tools.SpatialProbe <dir> <sideScale>"
  *
  * side = 65536·sideScale (sideScale 1 = the fixture's fixed domain;
  * sideScale 10 at 100× data = constant density). Prints one JSON line
  * with seconds (min of 2 timed passes after a warmup) and the output
  * pair count, so SCALING.md can report pairs alongside seconds.
  */
object SpatialProbe {

  /** The q159 fixture generalized to a `side`-wide domain (the fixture's
    * derivation with 65536 replaced; still integer-valued).
    */
  def points(s: SparkSession, dir: String, side: Long): DataFrame = {
    val c = graft.Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("k"))
    val hx = (col("k") * lit(2654435761L)) % lit(side)
    val hy = (col("k") * lit(40503L)) % lit(side)
    val home = c.select((col("k") * 2L).as("id"),
      hx.cast("double").as("x"), hy.cast("double").as("y"))
    val work = c.select((col("k") * 2L + 1L).as("id"),
      (hx + (col("k") * lit(48271L)) % 401L - 200L).cast("double").as("x"),
      (hy + (col("k") * lit(16807L)) % 401L - 200L).cast("double").as("y"))
    home.unionAll(work)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sideScale = if (args.length > 1) args(1).toLong else 1L
    val spark = graft.SessionDefaults(SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val side = 65536L * sideScale
    def leg(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Spatial.radiusPairs(points(spark, dir, side),
        "id", "x", "y", radius = 200.0, cellSize = 256.0).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    leg() // warmup
    val (t1, n1) = leg()
    val (t2, n2) = leg()
    require(n1 == n2, s"nondeterministic pair count: $n1 vs $n2")
    println(s"""{"probe":"q159","dir":"$dir","side":$side,""" +
      s""""sec":${math.min(t1, t2)},"pairs":$n1}""")
    spark.stop()
  }
}
