package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session — ScalaTest
  * suites run sequentially in the forked test JVM).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  /** Read JSON-lines from an in-memory string (no temp files). */
  def jsonDf(schema: org.apache.spark.sql.types.StructType, lines: String*): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(lines.toDS)
  }

  def rows(df: DataFrame): Seq[org.apache.spark.sql.Row] = df.collect().toSeq
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SessionDefaults(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
