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

  /** All k-token-window fingerprints of a token array in ONE compiled
    * pass — value-identical to `fingerprint(concat_ws(" ", window))` per
    * window (ShingleFingerprintSpec pins the equality on the real
    * corpus), but computed compositionally: per token t, H = fp(t) and
    * PW = 31^len(t) mod P are built once (O(total chars)); a window then
    * combines in O(k) modular ops via
    * fp(x ∘ " t") = (fp(x)·31^(len(t)+1) + (32·31^len(t) + fp(t))) mod P
    * (32 = ' '). The naive shape evaluates O(k · total chars) character
    * steps AND allocates a concatenated string per window — on the
    * minhash path (q27) the shingle layer was the measured hot spot
    * (BENCH_SELF_r11). Precondition: no null elements (the engine's
    * tokenizers never emit them).
    */
  def shingleFingerprints(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                          k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val m = n - k + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val fp = new Array[Long](n)
    val pw = new Array[Long](n)
    var i = 0
    while (i < n) {
      val str = arr.getUTF8String(i).toString
      var h = 0L
      var p = 1L
      var j = 0
      while (j < str.length) {
        h = (h * Base + str.charAt(j)) % Modulus
        p = (p * Base) % Modulus
        j += 1
      }
      fp(i) = h
      pw(i) = p
      i += 1
    }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = fp(i)
      var j = i + 1
      while (j < i + k) {
        // every factor < Modulus ≈ 1e9+7, so products stay < P² < 2⁶³
        h = ((h * ((pw(j) * Base) % Modulus)) % Modulus
          + (32L * pw(j) + fp(j)) % Modulus) % Modulus
        j += 1
      }
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** SimHash bit parameters: bit j of the signature is derived from the
    * affine hash yⱼ(x) = (SimA(j)·x + SimB(j)) mod SimP of the token's
    * rolling-hash fingerprint x — each bit its own member of the
    * 2-universal family over the prime field, instead of "the bits of one
    * xxhash64" (theoretically cleaner: per-bit pairwise independence is a
    * family property, not an avalanche hope). 62 bits keep every
    * intermediate — including the assembled signature — positive in a
    * signed 64-bit long, so the DuckDB oracle replays the construction
    * with plain BIGINT arithmetic (q28 is hash-verified, not rows-only).
    * Constants from the xxhash avalanche primes; aⱼ ≠ 0 because SimP is
    * prime and neither factor is ≡ 0 (mod SimP).
    */
  final val SimBits = 62
  final val SimP = 2147483647L // 2^31 − 1
  final val SimHalf = 1073741823L // floor(SimP / 2): y <= half votes +1
  val SimA: Array[Long] =
    Array.tabulate(SimBits)(j => (2246822519L * (2L * j + 1L)) % SimP)
  val SimB: Array[Long] =
    Array.tabulate(SimBits)(j => (3266489917L * (j + 1L)) % SimP)

  /** 62-bit SimHash of a token array: per-token rolling-hash fingerprint,
    * per-bit affine-hash vote (+1 iff yⱼ ≤ SimHalf), sign → bit.
    */
  def simhash(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](SimBits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null token → fingerprint 0 (tokenizers here never emit null; the
      // explicit check keeps the result independent of the array's
      // physical null-slot representation)
      val x = if (arr.isNullAt(i)) 0L else fingerprint(arr.getUTF8String(i))
      var j = 0
      while (j < SimBits) {
        val y = (SimA(j) * x + SimB(j)) % SimP
        if (y <= SimHalf) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < SimBits) {
      if (votes(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Native codegen 62-bit SimHash over a token array. The composed version
  * (`Dedup.simhashComposed`: aggregate + zip_with over a 62-slot vote
  * array) evaluates its lambdas per token × 62 bits on the interpreted HOF
  * path; this kernel is two tight loops. Bit math is identical: rolling-
  * hash fingerprint per token, per-bit affine vote (`TextHash.SimA/SimB`
  * over `SimP`), bit set when votes ≥ 0 — DedupSpec asserts parity, and
  * the q28 oracle replays the same construction in DuckDB SQL.
  */
case class SimHash62(child: Expression) extends UnaryExpression {

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

  override protected def withNewChildInternal(newChild: Expression): SimHash62 =
    copy(child = newChild)
}

/** Native codegen window-fingerprint generator: array<string> tokens →
  * array<long> of all k-window rolling-hash fingerprints (see
  * [[TextHash.shingleFingerprints]] for the composition law and why it
  * beats fingerprint-over-concat_ws on the hashed-shingle paths).
  */
case class ShingleFingerprints(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_fps"

  override def nullSafeEval(input: Any): Any =
    TextHash.shingleFingerprints(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = TextHash.getClass.getName
    defineCodeGen(ctx, ev, c => s"$kernel.MODULE$$.shingleFingerprints($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleFingerprints =
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
