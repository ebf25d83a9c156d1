package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Runtime kernel for the SimHash expression — static methods so the
  * generated code can call them directly (keeps whole-stage codegen). */
object SimHashImpl {

  /** FNV-1a 64-bit over raw bytes: simple, fast, stable across JVMs —
    * no dependence on Spark-internal hash utilities. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Charikar SimHash over a feature array: per bit, sum +1/-1 votes of
    * each feature's 64-bit hash; the sketch sets bits with positive
    * vote. Near-identical feature sets → small Hamming distance. */
  def simhash64(features: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = features.numElements()
    var i = 0
    while (i < n) {
      if (!features.isNullAt(i)) {
        val h = fnv1a64(features.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) res |= (1L << b)
      b += 1
    }
    res
  }
}

/** Native Catalyst expression: `simhash64(array<string>) -> bigint`.
  *
  * A custom `Expression` (SURVEY.md §7.3 preference order b) rather than
  * a Scala UDF: `doGenCode` emits a direct static call, so the operator
  * stays inside whole-stage codegen with no serialization boundary or
  * closure dispatch in the 100-TB hot path.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash {
  /** Register `simhash64` in the session's function registry (idempotent,
    * cheap) and return a Column applying it — usable from both the
    * DataFrame API and `spark.sql`. */
  def simhash(spark: SparkSession, features: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "built-in")
    call_function("simhash64", features)
  }
}
