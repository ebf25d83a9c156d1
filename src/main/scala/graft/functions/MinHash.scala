package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Runtime kernel for the MinHash band-key expression — static methods
  * so generated code can call them directly (keeps whole-stage codegen,
  * and the generated code stays a one-line call instead of a 64-wide
  * expression forest that takes seconds to Janino-compile). */
object MinHashImpl {

  /** Per-permutation hash i of a feature: one strong base hash of the
    * bytes (FNV-1a 64, stable across JVMs) diversified per permutation
    * by a Murmur3-finalizer mix — equivalent quality to rehashing per
    * permutation at 1/64th the cost. */
  private def mix(h0: Long, i: Int): Long = {
    var h = h0 ^ (0x9e3779b97f4a7c15L * (i + 1))
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** Banded minhash signature: `bands` keys, key b = hash of the band
    * index and permutation-minima (b*r … b*r+r-1). Single pass over the
    * feature array. numHashes = bands * r is fixed at 64/32 by the
    * expression below. */
  def bandKeys(features: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val r = numHashes / bands
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = features.numElements()
    var f = 0
    while (f < n) {
      if (!features.isNullAt(f)) {
        val base = SimHashImpl.fnv1a64(features.getUTF8String(f).getBytes)
        var i = 0
        while (i < numHashes) {
          val h = mix(base, i)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      f += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = 0x87c37b91114253d5L ^ b.toLong
      var j = 0
      while (j < r) {
        k = mix(k ^ mins(b * r + j), j)
        j += 1
      }
      keys(b) = k
      b += 1
    }
    new GenericArrayData(keys)
  }
}

/** Native Catalyst expression `minhash_bands(array<string>) ->
  * array<bigint>`: the banded MinHash signature of a feature set in one
  * fused pass (SURVEY.md §7.3 preference order b — a custom Expression
  * where composing built-ins would work but generates a 64-expression
  * forest with multi-second codegen compile time and 64 interpreted
  * array traversals per row). */
case class MinHashBandsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "bands must divide numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.bandKeys(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpl.bandKeys($c, $numHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

object MinHash {
  /** Register `minhash_bands` (idempotent) and apply it. */
  def minhashBands(spark: SparkSession, features: Column,
      numHashes: Int, bands: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_bands",
      exprs => MinHashBandsExpr(exprs.head, numHashes, bands), "built-in")
    call_function("minhash_bands", features)
  }
}
