package graft.functions

import java.security.MessageDigest
import java.util.{ArrayDeque, LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for the fused text→winnowed-fingerprints expression
  * behind `dedup_substring` (exact-substring cross-doc duplication,
  * MassiveText recipe arXiv:2112.11446 + winnowing per
  * Schleimer/Wilkerson/Aiken, SIGMOD'03 / MOSS).
  *
  * Semantics — identical to the composed built-ins it replaces and to
  * the DuckDB oracle:
  *   fps[i]  = substr(md5(concat_ws(' ', tokens[i..i+win-1])), 1, 16)
  *   wins    = distinct over j of min(fps[j..j+w-1])        (nfps ≥ w)
  *           | [min(fps)]                                   (0 < nfps < w)
  * Guarantee: two docs sharing ≥ win+w-1 consecutive tokens select at
  * least one common fingerprint; expected density 2/(w+1) of stride-1.
  *
  * Why native: the declarative form is two chained interpreted
  * higher-order transforms, and InferFiltersFromGenerate clones the
  * whole tree into a pushed-down `size(..)>0` filter below the
  * repartition — with `fps` inlined into the winnow lambda that
  * recomputes the full md5 window array PER SLICE, O(n²) md5s on the
  * single input split (observed 181 s cold at sf0.1). One codegen call
  * with a monotonic-deque sliding min is O(n) and stays cheap even when
  * redundantly cloned.
  */
object WinnowImpl {

  private val Empty: ArrayData = new GenericArrayData(new Array[Any](0))

  private val Md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".toCharArray

  /** First 16 hex chars of md5(data) == substr(md5_hex, 1, 16). */
  private def md5Prefix16(md: MessageDigest, data: Array[Byte], len: Int): String = {
    md.reset()
    md.update(data, 0, len)
    val dig = md.digest()
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HexDigits((dig(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(dig(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def winnowSet(text: UTF8String, win: Int, w: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val (starts, ends, nt) = ShinglesImpl.tokenRuns(bytes)
    if (nt < win) return Empty
    val nf = nt - win + 1
    val md = Md5.get()
    val fps = new Array[String](nf)
    // reusable window buffer sized to the largest window's joined bytes
    var buf = new Array[Byte](256)
    var i = 0
    while (i < nf) {
      var sz = win - 1
      var j = i
      while (j < i + win) { sz += ends(j) - starts(j); j += 1 }
      if (sz > buf.length) buf = new Array[Byte](Integer.highestOneBit(sz) * 2)
      var p = 0
      j = i
      while (j < i + win) {
        if (j > i) { buf(p) = ' '; p += 1 }
        val l = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), buf, p, l)
        p += l
        j += 1
      }
      fps(i) = md5Prefix16(md, buf, p)
      i += 1
    }
    val seen = new JLinkedHashSet[UTF8String]()
    if (nf < w) {
      var min = fps(0)
      i = 1
      while (i < nf) { if (fps(i).compareTo(min) < 0) min = fps(i); i += 1 }
      seen.add(UTF8String.fromString(min))
    } else {
      // monotonic deque of indices, increasing fp values — O(n) sliding min
      val dq = new ArrayDeque[Integer]()
      i = 0
      while (i < nf) {
        while (!dq.isEmpty && fps(dq.peekLast()).compareTo(fps(i)) >= 0) dq.pollLast()
        dq.addLast(i)
        if (dq.peekFirst() <= i - w) dq.pollFirst()
        if (i >= w - 1) seen.add(UTF8String.fromString(fps(dq.peekFirst())))
        i += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Native Catalyst expression `graft_winnow_<win>_<w>(string) ->
  * array<string>`: tokenize + window-fingerprint + winnow + distinct in
  * one whole-stage-codegen call (SURVEY.md §7.3 preference order b). */
case class WinnowExpr(child: Expression, win: Int, w: Int) extends UnaryExpression {
  require(win >= 1 && w >= 1, "window and winnow width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_winnow_${win}_$w"

  override def nullSafeEval(input: Any): Any =
    WinnowImpl.winnowSet(input.asInstanceOf[UTF8String], win, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.winnowSet($c, $win, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object Winnow {
  /** Register (idempotent; widths are part of the name so variants never
    * collide in the registry) and apply. */
  def winnow(spark: SparkSession, text: Column, win: Int, w: Int): Column = {
    val name = s"graft_winnow_${win}_$w"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => WinnowExpr(exprs.head, win, w), "built-in")
    call_function(name, text)
  }
}
