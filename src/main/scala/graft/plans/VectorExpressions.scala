package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen entry point — static method the generated Java calls.
  * Reads Tungsten `ArrayData` directly: no per-call conversion to
  * `Seq[Float]`, no boxing — the difference between this and a Scala UDF
  * is one materialized Scala collection per ROW on the similarity hot
  * path (millions of candidate pairs at corpus scale).
  */
object VectorStatics {
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** `array<double>` twin (random-projected vectors are double-typed —
    * they are sums of products of doubles). Same sequential fold.
    */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** Native double-precision dot product over two `array<float>` columns —
  * the §7.4 "custom `Expression`" path for the similarity operators:
  * participates in whole-stage codegen (`doGenCode` emits a direct
  * static call inside the generated loop) and evaluates element-wise
  * over `ArrayData`, replacing the interpreted higher-order-function /
  * UDF alternatives on the ANN scoring path. Arithmetic is the same
  * sequential double accumulation as the JVM-side `rawDot`, so results
  * are bit-identical across the expression and driver paths.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType      = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String      = "graft_dot"

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  // both sides must be float arrays or both double arrays — a mixed
  // pair would silently reinterpret Tungsten bytes, so it is rejected
  // at analysis, not coerced
  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires two array<float> or two array<double> arguments, got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private def static: String =
    if (elem(left.dataType).contains(DoubleType)) "dotD" else "dotF"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (elem(left.dataType).contains(DoubleType))
      VectorStatics.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      VectorStatics.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorStatics.$static($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
