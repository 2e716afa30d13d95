package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, FloatType, StringType}
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
