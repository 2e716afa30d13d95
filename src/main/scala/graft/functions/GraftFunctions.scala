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
    SimHash62(args(0))
  }

  private def shingleFpsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_shingle_fps expects 2 arguments (tokens, k), got ${args.length}")
    val kExpr = args(1)
    require(kExpr.foldable,
      "graft_shingle_fps' k argument must be a constant integer")
    val k = kExpr.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"graft_shingle_fps' k argument must be a constant integer, got $other")
    }
    require(k >= 1, s"graft_shingle_fps' k must be >= 1, got $k")
    ShingleFingerprints(args(0), k)
  }

  private def lshBucketBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"graft_lsh_bucket expects 2 arguments, got ${args.length}")
    // any constant-foldable integer works (bare literal, negated literal,
    // CAST, ...) — evaluate it rather than pattern-matching Literal
    val bitsExpr = args(1)
    require(bitsExpr.foldable,
      "graft_lsh_bucket's bits argument must be a constant integer")
    val bits = bitsExpr.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"graft_lsh_bucket's bits argument must be a constant integer, got $other")
    }
    HyperplaneSketch(args(0), bits)
  }

  private def topkBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"graft_topk expects 2 arguments, got ${args.length}")
    val kExpr = args(1)
    require(kExpr.foldable, "graft_topk's k argument must be a constant integer")
    val k = kExpr.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"graft_topk's k argument must be a constant integer, got $other")
    }
    TopKLargest(args(0), k).toAggregateExpression()
  }

  private def maxOrderableBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"graft_max_orderable expects 1 argument, got ${args.length}")
    MaxOrderable(args(0)).toAggregateExpression()
  }

  private def heavyCandidatesBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_heavy_candidates expects 2 arguments, got ${args.length}")
    val kExpr = args(1)
    require(kExpr.foldable,
      "graft_heavy_candidates' k argument must be a constant integer")
    val k = kExpr.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"graft_heavy_candidates' k argument must be a constant integer, got $other")
    }
    MisraGriesCandidates(args(0), k).toAggregateExpression()
  }

  // Spark ships BloomFilterAggregate / BloomFilterMightContain as
  // internal expressions for its own runtime row-level filtering but
  // does not register them as SQL functions; the engine exposes them
  // through the same registry as its own expressions. The bloom binary
  // handed to might_contain must be FOLDABLE (its analysis rule rejects
  // arbitrary columns), which is why BloomJoin inlines the built filter
  // as a literal.
  private def bloomAggBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"graft_bloom_agg expects 3 arguments (value, items, bits), got ${args.length}")
    new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      args(0), args(1), args(2)).toAggregateExpression()
  }

  private def bloomContainsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"graft_bloom_contains expects 2 arguments, got ${args.length}")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      args(0), args(1))
  }

  /** One (name, info, arity-checked builder) triple per engine function —
    * the single source both registration paths install from.
    */
  val allBuilders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", cosineInfo, cosineBuilder _),
    ("graft_sentiment",
      new ExpressionInfo(classOf[SentimentScore].getCanonicalName, "graft_sentiment"),
      sentimentBuilder _),
    ("graft_fingerprint",
      new ExpressionInfo(classOf[RollingHashFingerprint].getCanonicalName, "graft_fingerprint"),
      fingerprintBuilder _),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHash62].getCanonicalName, "graft_simhash"),
      simhashBuilder _),
    ("graft_shingle_fps",
      new ExpressionInfo(classOf[ShingleFingerprints].getCanonicalName, "graft_shingle_fps"),
      shingleFpsBuilder _),
    ("graft_lsh_bucket",
      new ExpressionInfo(classOf[HyperplaneSketch].getCanonicalName, "graft_lsh_bucket"),
      lshBucketBuilder _),
    ("graft_topk",
      new ExpressionInfo(classOf[TopKLargest].getCanonicalName, "graft_topk"),
      topkBuilder _),
    ("graft_max_orderable",
      new ExpressionInfo(classOf[MaxOrderable].getCanonicalName,
        "graft_max_orderable"),
      maxOrderableBuilder _),
    ("graft_heavy_candidates",
      new ExpressionInfo(classOf[MisraGriesCandidates].getCanonicalName,
        "graft_heavy_candidates"),
      heavyCandidatesBuilder _),
    ("graft_bloom_agg",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]
          .getCanonicalName, "graft_bloom_agg"),
      bloomAggBuilder _),
    ("graft_bloom_contains",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
          .getCanonicalName, "graft_bloom_contains"),
      bloomContainsBuilder _))

  /** Idempotent runtime registration into the session's function registry. */
  def register(spark: SparkSession): Unit =
    allBuilders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** DataFrame-API handles; require [[register]] on the session first. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def sentiment(text: Column): Column = call_function("graft_sentiment", text)
  def fingerprint(text: Column): Column = call_function("graft_fingerprint", text)
  def simhash62(tokens: Column): Column = call_function("graft_simhash", tokens)
  def shingleFps(tokens: Column, k: Int): Column =
    call_function("graft_shingle_fps", tokens,
      org.apache.spark.sql.functions.lit(k))
  def lshBucket(v: Column, bits: Int): Column =
    call_function("graft_lsh_bucket", v, org.apache.spark.sql.functions.lit(bits))
  def topk(v: Column, k: Int): Column =
    call_function("graft_topk", v, org.apache.spark.sql.functions.lit(k))
  def maxOrderable(v: Column): Column = call_function("graft_max_orderable", v)
  def heavyCandidates(v: Column, k: Int): Column =
    call_function("graft_heavy_candidates", v,
      org.apache.spark.sql.functions.lit(k))
}

/** `spark.sql.extensions` entry point — installs the same functions
  * (same arity-checked builders) as [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.allBuilders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}
