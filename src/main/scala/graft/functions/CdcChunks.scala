package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking over the token stream (Rabin-Karp style):
  * a chunk boundary falls after token i when the rolling hash of the
  * last `window` tokens is ≡ 0 (mod `target`), giving expected chunk
  * length ≈ `target` tokens. Each chunk is fingerprinted (FNV-1a of
  * its tokens joined by space).
  *
  * Why content-defined instead of fixed-size: boundaries depend only on
  * LOCAL content, so an insertion near the start of a document shifts
  * chunk boundaries only until the next content boundary — the rest of
  * the fingerprints are unchanged. That is what makes chunk-level
  * matching detect PARTIAL duplication (one doc containing another,
  * shared boilerplate spans) that whole-document fingerprints and
  * full-set Jaccard both miss or dilute. */
object CdcChunksImpl {

  private val Empty: ArrayData = new GenericArrayData(new Array[Any](0))

  private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** FNV-1a over a byte slice, seeded to chain token hashes. */
  private def fnvToken(bytes: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var h = seed
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // separator byte keeps "ab c" != "a bc"
    h ^= ' '.toLong
    h * 0x100000001b3L
  }

  def chunkFingerprints(text: UTF8String, window: Int, target: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    // token spans, same tokenizer as ShinglesImpl
    var starts = new Array[Int](64)
    var ends = new Array[Int](64)
    var nt = 0
    var i = 0
    while (i < len) {
      if (isAlnum(bytes(i))) {
        val s = i
        while (i < len && isAlnum(bytes(i))) i += 1
        if (nt == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nt * 2)
          ends = java.util.Arrays.copyOf(ends, nt * 2)
        }
        starts(nt) = s; ends(nt) = i; nt += 1
      } else i += 1
    }
    if (nt == 0) return Empty
    // per-token base hashes for the rolling boundary test
    val tokHash = new Array[Long](nt)
    var t = 0
    while (t < nt) {
      tokHash(t) = fnvToken(bytes, starts(t), ends(t), 0xcbf29ce484222325L)
      t += 1
    }
    val fps = scala.collection.mutable.ArrayBuffer[Long]()
    var chunkStart = 0
    var chunkHash = 0xcbf29ce484222325L
    var k = 0
    while (k < nt) {
      chunkHash = fnvToken(bytes, starts(k), ends(k), chunkHash)
      // rolling window hash: mix of the last `window` token hashes
      var wh = 0x9e3779b97f4a7c15L
      var w = math.max(0, k - window + 1)
      while (w <= k) { wh = (wh ^ tokHash(w)) * 0xc4ceb9fe1a85ec53L; w += 1 }
      val boundary = (k - chunkStart + 1 >= window) &&
        java.lang.Long.remainderUnsigned(wh, target.toLong) == 0L
      if (boundary || k == nt - 1) {
        fps += chunkHash
        chunkStart = k + 1
        chunkHash = 0xcbf29ce484222325L
      }
      k += 1
    }
    new GenericArrayData(fps.toArray)
  }
}

/** `cdc_chunks_<w>_<t>(string) -> array<bigint>` — chunk fingerprints
  * of a document's token stream (one fused codegen pass, like
  * ShinglesExpr). */
case class CdcChunksExpr(child: Expression, window: Int, target: Int)
    extends UnaryExpression {
  require(window >= 1 && target >= 1, "window and target must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"cdc_chunks_${window}_$target"

  override def nullSafeEval(input: Any): Any =
    CdcChunksImpl.chunkFingerprints(input.asInstanceOf[UTF8String], window, target)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunksImpl.chunkFingerprints($c, $window, $target)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcChunks {
  def chunks(spark: SparkSession, text: Column, window: Int, target: Int): Column = {
    val name = s"cdc_chunks_${window}_$target"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => CdcChunksExpr(exprs.head, window, target), "built-in")
    call_function(name, text)
  }
}
