package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Runtime kernels for dense-vector math. The fold order is strictly
  * left-to-right sequential IEEE accumulation — the SAME order as the
  * `aggregate(zip_with(...))` higher-order formulation in
  * VectorFunctions and as DuckDB's `list_sum(list_transform(...))`, so
  * results stay bit-identical across all three while running as a tight
  * primitive loop instead of an interpreted per-element lambda chain. */
object VectorOpsImpl {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  def hyperplaneSketch(vec: ArrayData, planeBits: Int): Int = {
    val n = vec.numElements()
    var bucket = 0
    var b = 0
    while (b < planeBits) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val sign =
          if (scala.util.hashing.byteswap64((b.toLong << 32) | i) % 2 == 0) 1.0
          else -1.0
        proj += vec.getDouble(i) * sign
        i += 1
      }
      if (proj >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }
}

/** `vector_dot(array<double>, array<double>) -> double` — native
  * Catalyst expression (SURVEY.md §7.3b): the higher-order-function
  * formulation is semantically identical but interpreted per element;
  * the 100 TB hot path (all-pairs cosine, ANN re-rank) wants one fused
  * primitive loop inside whole-stage codegen. */
case class VectorDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot requires two array<double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOpsImpl.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotExpr =
    copy(left = newLeft, right = newRight)
}

/** `vector_norm(array<double>) -> double` — L2 norm, same contract. */
case class VectorNormExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_norm requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  override def nullSafeEval(input: Any): Any =
    VectorOpsImpl.norm(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOpsImpl.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): VectorNormExpr =
    copy(child = newChild)
}

/** `hyperplane_sketch(array<double>) -> int` — random-hyperplane sign
  * sketch for cosine LSH. Plane component (b, i) is ±1 by the parity of
  * byteswap64((b<<32)|i): pseudo-random, fully deterministic, zero RNG
  * state — identical buckets to the composed-Column formulation it
  * replaces (same left-to-right projection accumulation), but one fused
  * loop instead of a planeBits×dim expression forest. */
case class HyperplaneSketchExpr(child: Expression, planeBits: Int)
    extends UnaryExpression {
  // planeBits = 0 is the EXACT degenerate tier: every vector sketches
  // to bucket 0, so bucketed probing equals the full cross probe —
  // the oracle-checkable twin of the approximate configurations
  require(planeBits >= 0 && planeBits <= 30, "planeBits in [0,30]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sketch requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "hyperplane_sketch"

  override def nullSafeEval(input: Any): Any =
    VectorOpsImpl.hyperplaneSketch(input.asInstanceOf[ArrayData], planeBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOpsImpl.hyperplaneSketch($c, $planeBits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketchExpr =
    copy(child = newChild)
}

object VectorOps {
  private def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDotExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_norm", exprs => VectorNormExpr(exprs.head), "built-in")
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("vector_dot", a, b)
  }
  def norm(spark: SparkSession, a: Column): Column = {
    register(spark); call_function("vector_norm", a)
  }
  def hyperplaneSketch(spark: SparkSession, a: Column, planeBits: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_sketch",
      exprs => HyperplaneSketchExpr(exprs.head, planeBits), "built-in")
    call_function("hyperplane_sketch", a)
  }
}
