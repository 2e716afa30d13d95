package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` embedding columns.
  *
  * This is the engine's one hot-loop custom Expression (SURVEY.md §7.3
  * preference order: compose built-ins → custom Expression → custom plan).
  * The composed-built-ins version (`zip_with` + `aggregate`, see
  * graft.similarity.Similarity.dot) materializes an intermediate array and
  * boxes every element through the higher-order-function lambda; this
  * expression whole-stage-codegens to a tight primitive `for` loop over the
  * two ArrayData buffers — no allocation per row beyond the accumulators.
  *
  * Semantics (bit-identical to the composed version, so the DuckDB oracle
  * still matches): elementwise Float→Double upcast, sequential
  * ascending-index accumulation of dot/|x|²/|y|², result
  * dot/(√|x|²·√|y|²); NULL if either input is null or either norm is 0.
  * Arrays of unequal length use the common prefix (embeddings are
  * fixed-width; this mirrors `zip_with`'s null-padding never firing).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual type check (ExpectsInputTypes.inputTypes is private[sql]-typed)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) $x.getFloat($i);
         |  final double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Static kernel shared by [[HyperplaneSketch]]'s eval and generated code. */
object VectorHash {

  /** Plane-component hash constants — integer arithmetic over the
    * Mersenne prime so the DuckDB oracle replays the sketch exactly
    * (which is what turned q29/q30 from rows-only into hash-verified).
    * The mixer is QUADRATIC-congruential — m₁ affine, then m₁² mod P
    * folded back in — because a purely affine map of the sequential
    * (plane, dim) index would leave linear structure across components
    * (the measured q126 LCG-vs-Wang lesson: mixing quality is
    * load-bearing for projection-based sketches); the squaring step
    * breaks that linearity while staying expressible as plain BIGINT
    * multiply/mod in both engines. Gated on the planted-recall floors in
    * QualityFloorsSpec/SimilaritySpec before the swap (same discipline
    * as the q27/q28 hash conversion).
    */
  final val PlaneP = 2147483647L       // 2^31 − 1
  final val PlaneA1 = 506952114L       // 2654435761 mod P (golden ratio)
  final val PlaneB1 = 1013904223L      // Numerical Recipes increment
  final val PlaneA2 = 1566083941L      // Waterman multiplier
  final val PlaneDimStride = 8191L     // prime > any embedding width here

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * i = p·stride + j + 1; m₁ = (A₁·i + B₁) mod P; m₂ = m₁² mod P;
    * m₃ = (A₂·m₂ + m₁) mod P; component = (m₃ mod 2000001 − 10⁶)/10⁶.
    * Every intermediate stays below 2⁶³ (m₁² < P² ≈ 4.6e18), so Spark
    * longs and DuckDB BIGINTs compute identical values. Exactly the
    * composed `Similarity.lshBucketComposed` formula — buckets are
    * bit-identical (VectorExpressionsSpec parity).
    */
  def planeComponent(p: Int, j: Long): Double = {
    val i = p * PlaneDimStride + j + 1L
    val m1 = (PlaneA1 * i + PlaneB1) % PlaneP
    val m2 = (m1 * m1) % PlaneP
    val m3 = (PlaneA2 * m2 + m1) % PlaneP
    ((m3 % 2000001L) - 1000000L).toDouble / 1000000.0
  }

  /** Plane matrix cache: a plane row is a pure function of (plane, dims) —
    * without this, every row would redo bits × dims × 2 xxhash64 calls,
    * which dominates the dot product the kernel exists to speed up.
    * Bounded: bits ≤ 64 × the handful of distinct embedding widths in play.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def planeRow(p: Int, dims: Int): Array[Double] =
    planeCache.computeIfAbsent((p, dims),
      _ => Array.tabulate(dims)(j => planeComponent(p, j.toLong)))

  def hyperplaneSketch(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    var sketch = 0L
    var p = 0
    while (p < bits) {
      val plane = planeRow(p, n)
      var proj = 0.0
      var j = 0
      while (j < n) {
        proj += arr.getFloat(j).toDouble * plane(j)
        j += 1
      }
      if (proj >= 0.0) sketch |= (1L << p)
      p += 1
    }
    sketch
  }
}

/** Native codegen b-bit random-hyperplane sign sketch over an
  * `array<float>` embedding — the LSH bucket id for ANN/near-dup search.
  * The composed column version evaluates its fold lambda per (plane × dim)
  * on the interpreted HOF path AND recomputes the plane components' hash
  * chain per row; this kernel is two tight loops. Bit-identical output
  * (parity pinned in VectorExpressionsSpec).
  */
case class HyperplaneSketch(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    VectorHash.hyperplaneSketch(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = VectorHash.getClass.getName
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernel.MODULE$$.hyperplaneSketch($c, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)
}
