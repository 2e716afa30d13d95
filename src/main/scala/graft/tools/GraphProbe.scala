package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SessionDefaults
import graft.graph.{KCore, PageRank}

/** Scaling-audit diagnostic: run the q94 k-core peel against an arbitrary
  * testdata dir and print the rounds-to-fixpoint as one JSON line —
  * the round-count evidence SCALING.md records for the iterative graph
  * family (q57/q121 are fixed-round by construction; q94's convergence
  * is the data-dependent one).
  *
  * Usage: runMain graft.tools.GraphProbe <sfDir> [maxRounds]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val maxRounds = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val b = PageRank.purchaseEdgesInt(spark, dir)
    val und = b.union(b.select(col("dst").as("src"), col("src").as("dst")))
    try {
      val (core, rounds) = KCore.kcoreCounted(und, k = 10, maxRounds)
      println(s"""{"dir":"$dir","rows":${core.count()},"rounds":$rounds,"maxRounds":$maxRounds}""")
    } catch {
      case e: IllegalStateException =>
        println(s"""{"dir":"$dir","fail":"${e.getMessage}","maxRounds":$maxRounds}""")
    }
    spark.stop()
  }
}
