package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration for the engine's custom Catalyst expressions.
  *
  * Two paths, both standard Spark extension points:
  *  - [[register]] — runtime temp-function registration on an existing
  *    session (works on any session, e.g. one handed in by a driver);
  *  - [[GraftExtensions]] — `spark.sql.extensions=graft.functions.GraftExtensions`
  *    for sessions built from config (cluster-wide installs).
  *
  * After either, `graft_cosine(a, b)` is callable from SQL and via
  * [[cosine]] from the DataFrame API.
  */
object GraftFunctions {

  val cosineInfo: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getCanonicalName, "graft_cosine")

  private def cosineBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"graft_cosine expects 2 arguments, got ${args.length}")
    CosineSimilarity(args(0), args(1))
  }

  private def sentimentBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"graft_sentiment expects 1 argument, got ${args.length}")
    SentimentScore(args(0))
  }

  private def fingerprintBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"graft_fingerprint expects 1 argument, got ${args.length}")
    RollingHashFingerprint(args(0))
  }

  private def simhashBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"graft_simhash expects 1 argument, got ${args.length}")
    SimHash64(args(0))
  }

  private def lshBucketBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"graft_lsh_bucket expects 2 arguments, got ${args.length}")
    val bits = args(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(
        "graft_lsh_bucket's bits argument must be an integer literal")
    }
    HyperplaneSketch(args(0), bits)
  }

  /** Idempotent runtime registration into the session's function registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sentiment", sentimentBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fingerprint", fingerprintBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", simhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_bucket", lshBucketBuilder, "built-in")
  }

  /** DataFrame-API handles; require [[register]] on the session first. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def sentiment(text: Column): Column = call_function("graft_sentiment", text)
  def fingerprint(text: Column): Column = call_function("graft_fingerprint", text)
  def simhash64(tokens: Column): Column = call_function("graft_simhash", tokens)
  def lshBucket(v: Column, bits: Int): Column =
    call_function("graft_lsh_bucket", v, org.apache.spark.sql.functions.lit(bits))
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      GraftFunctions.cosineInfo,
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sentiment"),
      new ExpressionInfo(classOf[SentimentScore].getCanonicalName, "graft_sentiment"),
      (args: Seq[Expression]) => SentimentScore(args(0))))
  }
}
