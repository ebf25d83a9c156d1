package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused set-size kernels: `|a ∩ b|` and `|a ∪ b|` for string arrays
  * WITHOUT materializing the intermediate array that
  * `size(array_intersect(a, b))` / `size(array_union(a, b))` build per
  * row. Exact Spark semantics: distinct elements, a null element counts
  * once when the built-ins would keep it. */
object SetSizesImpl {

  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val inB = new java.util.HashSet[UTF8String]()
    var bNull = false
    var i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) bNull = true else inB.add(b.getUTF8String(i))
      i += 1
    }
    val counted = new java.util.HashSet[UTF8String]()
    var n = 0
    var aNullCounted = false
    var j = 0
    val na = a.numElements()
    while (j < na) {
      if (a.isNullAt(j)) {
        if (bNull && !aNullCounted) { n += 1; aNullCounted = true }
      } else {
        val v = a.getUTF8String(j)
        if (inB.contains(v) && counted.add(v)) n += 1
      }
      j += 1
    }
    n
  }

  def unionSize(a: ArrayData, b: ArrayData): Int = {
    val seen = new java.util.HashSet[UTF8String]()
    var hasNull = false
    var n = 0
    def scan(arr: ArrayData): Unit = {
      var i = 0
      val len = arr.numElements()
      while (i < len) {
        if (arr.isNullAt(i)) hasNull = true
        else if (seen.add(arr.getUTF8String(i))) n += 1
        i += 1
      }
    }
    scan(a); scan(b)
    if (hasNull) n + 1 else n
  }
}

sealed abstract class SetSizeExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string>, got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = IntegerType
}

case class IntersectSizeExpr(left: Expression, right: Expression)
    extends SetSizeExpr {
  override def prettyName: String = "intersect_size"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetSizesImpl.intersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetSizesImpl.intersectSize($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSizeExpr =
    copy(left = newLeft, right = newRight)
}

case class UnionSizeExpr(left: Expression, right: Expression)
    extends SetSizeExpr {
  override def prettyName: String = "union_size"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetSizesImpl.unionSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetSizesImpl.unionSize($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnionSizeExpr =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (SURVEY.md §7.3c — the custom-Rule tier): rewrites
  * `size(array_intersect(a, b))` / `size(array_union(a, b))` over
  * string arrays into the fused counting kernels. The built-in pair
  * materializes a full intermediate array per row only to take its
  * length — in the dedup verification hot path (exact Jaccard over LSH
  * candidates) that is the dominant allocation at scale.
  *
  * Only fires when `legacySizeOfNull` is off (default): the fused
  * expressions are null-intolerant like the non-legacy `size`. */
object FuseSetSizes extends Rule[LogicalPlan] {
  private def strArr(e: Expression) = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), false) if strArr(a) && strArr(b) =>
        IntersectSizeExpr(a, b)
      case Size(ArrayUnion(a, b), false) if strArr(a) && strArr(b) =>
        UnionSizeExpr(a, b)
    }

  /** Install on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(FuseSetSizes))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseSetSizes
}
