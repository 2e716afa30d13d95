package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SessionDefaults
import graft.graph.{HyperBall, Triangles}

/** Scaling-audit diagnostic for the q177 probe twin: time the probed
  * neighborhood at several probe counts against an arbitrary testdata
  * dir, to separate the register-propagation floor (q183's cost) from
  * the probe-exact verification surcharge.
  *
  * Usage: runMain graft.tools.HbProbe <sfDir> [probes...]
  */
object HbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val probeCounts =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Triangles.coPurchaseEdges(spark, dir, maxDf = 18)
    val bi = e.select(col("u"), col("v"))
      .unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    bi.count() // edge build paid once, outside every timing below
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("sketch-only") {
      HyperBall.neighborhood(bi, hops = 3, exactCheck = false)
        .collect()
    }
    probeCounts.foreach { p =>
      time(s"probed($p)") {
        HyperBall.neighborhoodProbed(bi, hops = 3, nProbes = p).collect()
      }
    }
    // bench-equivalent end-to-end passes (edge build inside the timer)
    (1 to 2).foreach { i =>
      time(s"q183-e2e#$i") {
        HyperBall.hllReachSketchQuery(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"q177-e2e#$i") {
        HyperBall.hllReachQuery(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
