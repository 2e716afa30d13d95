package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints `explain("formatted")` for each query (or
  * the ones named in args) so scan pruning / pushed filters / join
  * strategies / codegen spans can be reviewed without a notebook.
  * Run: `sbt "runMain graft.Explain [sfDir] [query ...]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None     => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
