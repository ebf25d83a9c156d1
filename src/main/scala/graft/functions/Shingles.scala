package graft.functions

import java.util.{LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for the fused text→shingles expression.
  *
  * Semantically identical to the composed built-ins
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(filter(split(lower(text),"[^a-z0-9]+"), t -> length(t)>0),
  * i+1, n))))` and to the DuckDB oracle fragment
  * `list_distinct([array_to_string(tk[i:i+n-1],' ') ...])` — but one
  * generated-code call per row instead of an interpreted
  * higher-order-function forest that costs milliseconds per document
  * (the tokenizer alone gets re-inlined up to 4× by predicate
  * inference, see Dedup scaladoc).
  */
object ShinglesImpl {

  private val Empty: ArrayData = new GenericArrayData(new Array[Any](0))

  private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Token runs of `bytes` (already lowercased): returns (starts, ends,
    * count). One pass, zero regex: every token byte is ASCII `[a-z0-9]`
    * (multi-byte UTF-8 units are ≥ 0x80, hence separators — exactly what
    * the `[^a-z0-9]+` split does). Shared by the shingle and winnow
    * kernels so both sides of dedup see the identical tokenizer. */
  private[functions] def tokenRuns(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val len = bytes.length
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
    (starts, ends, nt)
  }

  /** Distinct word n-gram shingles of lowercased alphanumeric-run
    * tokens, first-occurrence order. */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val (starts, ends, nt) = tokenRuns(bytes)
    if (nt < n) return Empty
    val seen = new JLinkedHashSet[UTF8String]((nt - n + 1) * 2)
    var w = 0
    while (w + n <= nt) {
      var sz = n - 1
      var j = w
      while (j < w + n) { sz += ends(j) - starts(j); j += 1 }
      val out = new Array[Byte](sz)
      var p = 0
      j = w
      while (j < w + n) {
        if (j > w) { out(p) = ' '; p += 1 }
        val l = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), out, p, l)
        p += l
        j += 1
      }
      seen.add(UTF8String.fromBytes(out))
      w += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Native Catalyst expression `graft_shingles_<n>(string) ->
  * array<string>`: tokenize + shingle + distinct fused in one call that
  * whole-stage codegen emits directly (SURVEY.md §7.3 preference order
  * b). Replaces a 5-deep interpreted HigherOrderFunction tree in the
  * dedup hot path — the single hottest per-row computation at 100 TB. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_shingles_$n"

  override def nullSafeEval(input: Any): Any =
    ShinglesImpl.shingleSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesImpl.shingleSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object Shingles {
  /** Register (idempotent; the shingle width is part of the name so
    * different widths never collide in the registry) and apply. */
  def shingles(spark: SparkSession, text: Column, n: Int): Column = {
    val name = s"graft_shingles_$n"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => ShinglesExpr(exprs.head, n), "built-in")
    call_function(name, text)
  }
}
