package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Sentiment

/** Native Catalyst expression for the VADER-style compound sentiment score
  * (SURVEY.md §2.8 U1, stretch path (b)): the scorer runs inside
  * whole-stage codegen as a direct static call — no ScalaUDF wrapper, no
  * encoder round-trip, no closure serialization per task.
  *
  * Null contract matches the reference (`Review_ETL.py:74`): null text →
  * 0.0f, NOT null — implemented via eval/codegen overrides since the
  * default null-propagation would return null.
  */
case class SentimentScore(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = FloatType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_sentiment"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0.0f
    else Sentiment.compound(v.asInstanceOf[UTF8String].toString)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val scorer = Sentiment.getClass.getName // "graft.text.Sentiment$"
    ev.copy(
      code = code"""
        ${childGen.code}
        float ${ev.value} = 0.0f;
        if (!${childGen.isNull}) {
          ${ev.value} = $scorer.MODULE$$.compound(${childGen.value}.toString());
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SentimentScore =
    copy(child = newChild)
}

/** Static kernel for [[RollingHashFingerprint]] — kept as a plain method so
  * generated code calls straight into JIT-compiled Scala.
  */
object TextHash {
  final val Modulus = 1000000007L
  final val Base = 31L

  /** h = fold(chars)((h*31 + char) mod 1e9+7). Iterates UTF-16 units, which
    * equals per-character code points for BMP text (the corpora here are
    * ASCII; the composed-HOF variant in TextOps uses `ascii()` with the same
    * equivalence).
    */
  def fingerprint(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * Base + str.charAt(i)) % Modulus
      i += 1
    }
    h
  }

  /** 64-bit SimHash of a token array: per-token xxhash64 (Spark's default
    * seed 42), per-bit vote, sign → bit.
    */
  def simhash(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null token → seed, matching Spark's xxhash64-of-null semantics in
      // the composed variant; without the explicit check the result would
      // depend on the array's physical representation (UnsafeArrayData's
      // zeroed null slot reads as an empty string)
      val h =
        if (arr.isNullAt(i)) 42L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Native codegen 64-bit SimHash over a token array. The composed version
  * (`Dedup.simhashComposed`: aggregate + zip_with over a 64-slot vote
  * array) evaluates its lambdas per token × 64 bits on the interpreted HOF
  * path; this kernel is two tight loops. Bit math is identical: xxhash64
  * (seed 42, Spark's default) per token, vote per bit, bit set when votes
  * ≥ 0 — DedupSpec asserts parity.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    TextHash.simhash(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = TextHash.getClass.getName
    defineCodeGen(ctx, ev, c => s"$kernel.MODULE$$.simhash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Native codegen rolling-hash document fingerprint. The composed version
  * (`TextOps.fingerprint`: sequence → transform → aggregate) allocates an
  * index array per row and evaluates the fold lambda per character on the
  * interpreted higher-order-function path — ~10× slower on real corpora.
  * Same values (q23's DuckDB oracle covers both).
  */
case class RollingHashFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any =
    TextHash.fingerprint(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = TextHash.getClass.getName // "graft.functions.TextHash$"
    defineCodeGen(ctx, ev, c => s"$kernel.MODULE$$.fingerprint($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashFingerprint =
    copy(child = newChild)
}
