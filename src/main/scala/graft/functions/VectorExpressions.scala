package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** JVM kernels for the vector hot loops. Spark's higher-order array
  * functions (`aggregate`/`transform`/`zip_with`) evaluate INTERPRETED —
  * roughly a microsecond of expression-tree walking per element — which is
  * the dominant per-candidate-pair cost of the ANN/dedup family at scale.
  * These loops do the same IEEE double ops in the same index order (each
  * float widened to double, products accumulated sequentially), so results
  * are bit-identical to the interpreted [[graft.queries.Portable.dotFold]]
  * and to DuckDB's `list_reduce` — pinned by the v06 parity query, which
  * runs the native expressions against the composed-form oracle.
  *
  * Element nulls are not handled (the embeddings contract is non-null
  * float arrays); length mismatches fold over the shorter prefix.
  */
object VectorFunctions {

  /** Sequential-fold dot product — native twin of `Portable.dotFold`. */
  def dotFold(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Deterministic-hyperplane dot — native twin of `VectorQueries.planeDot`:
    * component i (1-based) of plane j is `(j*37 + i*101) % 97 - 48`. */
  def planeDot(e: ArrayData, j: Int): Double = {
    val n = e.numElements()
    var acc = 0.0
    var i = 1
    while (i <= n) {
      acc += e.getFloat(i - 1).toDouble * ((j * 37 + i * 101) % 97 - 48).toDouble
      i += 1
    }
    acc
  }
}

/** `dot_fold(array<float>, array<float>) -> double` as a codegen'd native
  * expression (SURVEY §4.3 preference order: native Expression over UDF
  * over interpreted HOF for hot scalar loops). */
case class DotFold(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_fold"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorFunctions.dotFold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorFunctions.dotFold($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `plane_dot(array<float>, int) -> double` — the LSH signature component. */
case class PlaneDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "plane_dot"

  override protected def nullSafeEval(e: Any, j: Any): Any =
    VectorFunctions.planeDot(e.asInstanceOf[ArrayData], j.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, j) =>
      s"graft.functions.VectorFunctions.planeDot($e, $j)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
