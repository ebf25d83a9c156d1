package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Runtime kernel for IVF (inverted-file) cell assignment: nearest
  * centroids of a vector under L2, used both to build the inverted
  * lists (nprobe=1) and to pick probe cells for queries (nprobe>1). */
object IvfImpl {

  /** Indices of the `nprobe` nearest centroids, nearest first,
    * deterministic lowest-index tiebreak. Selection is repeated argmin
    * (nprobe is small — 1..16 — so this beats a heap). */
  def nearestCells(vec: ArrayData, cents: Array[Array[Double]],
      nprobe: Int): ArrayData = {
    val k = cents.length
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = math.min(vec.numElements(), cent.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val diff = vec.getDouble(i) - cent(i)
        acc += diff * diff
        i += 1
      }
      d2(c) = acc
      c += 1
    }
    val m = math.min(nprobe, k)
    val sel = new Array[Int](m)
    val used = new Array[Boolean](k)
    var s = 0
    while (s < m) {
      var best = -1
      var bd = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        if (!used(j) && d2(j) < bd) { bd = d2(j); best = j }
        j += 1
      }
      used(best) = true
      sel(s) = best
      s += 1
    }
    new GenericArrayData(sel)
  }
}

/** Native Catalyst expression `ivf_cells(array<double>) -> array<int>`:
  * the trained centroid matrix ships with the expression as a codegen
  * reference object (the standard pattern for broadcast-size model
  * state inside whole-stage codegen — the coarse quantizer is a few
  * nlist×dim KB, nothing like the corpus). */
case class IvfCellsExpr(child: Expression, centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {
  require(nprobe >= 1, "nprobe >= 1")
  require(centroids.nonEmpty, "need at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_cells requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cells"

  override def nullSafeEval(input: Any): Any =
    IvfImpl.nearestCells(input.asInstanceOf[ArrayData], centroids, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.IvfImpl.nearestCells($c, $ref, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCellsExpr =
    copy(child = newChild)
}

object IvfOps {
  /** Register under a name keyed by the centroid content + nprobe (two
    * coexisting quantizers must not collide in the registry) and apply. */
  def cells(spark: SparkSession, vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column = {
    val h = java.util.Arrays.deepHashCode(
      centroids.asInstanceOf[Array[AnyRef]]) & 0x7fffffff
    val name = s"ivf_cells_${h}_$nprobe"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => IvfCellsExpr(exprs.head, centroids, nprobe), "built-in")
    call_function(name, vec)
  }
}
