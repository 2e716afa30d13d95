package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: a vanilla session (no engine-specific
  * config) calling SparkEntry.entry, expecting rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE rows=$n cols=${df.columns.length}")
    assert(n > 0)
    spark.stop()
  }
}
