package graft.ml

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen expression scoring the broadcast XGB ensemble over a
  * feature array column (M6). Replaces the Scala-UDF formulation, which
  * boxed every feature into a Seq[Double] per row and broke the
  * whole-stage-codegen span around the scoring projection; here the
  * generated code passes the unsafe array straight into the tree walker.
  * The model rides a Broadcast handle, so the expression (which is
  * serialized with every task) stays bytes-small while the ~MB tree
  * arrays ship once per executor.
  */
case class XgbScoreExpr(child: Expression, model: Broadcast[XgbModel],
    outputMargin: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  private def method: String = if (outputMargin) "marginArray" else "predictProbArray"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (outputMargin) model.value.marginArray(a) else model.value.predictProbArray(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("xgbModel", model,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((graft.ml.XgbModel) $bcRef.value()).$method($c);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XgbScoreExpr {
  def score(features: Column, model: Broadcast[XgbModel]): Column =
    Bridge.column(XgbScoreExpr(Bridge.expression(features), model))

  /** Raw additive margin (no sigmoid) — the oracle-exact surface; see
    * [[XgbModel.marginArray]].
    */
  def margin(features: Column, model: Broadcast[XgbModel]): Column =
    Bridge.column(XgbScoreExpr(Bridge.expression(features), model, outputMargin = true))
}
