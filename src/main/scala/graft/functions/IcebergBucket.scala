package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec bucket hashing: 32-bit Murmur3 (x86 variant, seed 0)
  * over the spec's per-type byte encodings, bucket index
  * `(hash & Integer.MAX_VALUE) % n`. This is the hash the Iceberg
  * table spec mandates for the `bucket[N]` partition transform (spec
  * §"Bucket Transform Details" + Appendix B), so partition indexes
  * computed here are readable — and prunable — by ANY spec-compliant
  * external engine (the interop loop the reference exercises with
  * DuckDB's `iceberg_scan`, `query_iceberg_duckdb.py:21-29`), unlike
  * graft's native xxhash64 `bucket(n,col)` which exports as `void`.
  *
  * Implemented from the published algorithm (Austin Appleby's
  * MurmurHash3, public domain) rather than Spark's internal
  * `Murmur3_x86_32` so the byte-level behavior is explicit and
  * endian-independent; the spec's Appendix-B test vectors are pinned
  * in SnaplogSpec.
  *
  * Per-type encodings (Iceberg spec Appendix B):
  *  - int, date        → widen to long, hash 8-byte little-endian
  *  - long, timestamp  → 8-byte little-endian
  *  - decimal(p,s)     → minimal two's-complement BIG-endian bytes of
  *                       the unscaled value (BigInteger.toByteArray)
  *  - string           → UTF-8 bytes
  *  - binary           → raw bytes
  * float/double/boolean are NOT bucketable (spec disallows them —
  * -0.0/+0.0 and NaN make hashing floats unsound for equality).
  *
  * Static methods so generated code calls them directly (stays inside
  * whole-stage codegen).
  */
object IcebergBucketImpl {

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  private def mixK1(k: Int): Int = {
    var k1 = k * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }

  private def mixH1(h: Int, k1: Int): Int = {
    var h1 = h ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  private def fmix(hIn: Int, len: Int): Int = {
    var h = hIn ^ len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  /** murmur3_x86_32(bytes, seed=0). */
  def hashBytes(bytes: Array[Byte]): Int = {
    val len = bytes.length
    val nblocks = len >>> 2
    var h1 = 0 // seed 0 per the Iceberg spec
    var i = 0
    while (i < nblocks) {
      val b = i << 2
      val k = (bytes(b) & 0xff) |
        ((bytes(b + 1) & 0xff) << 8) |
        ((bytes(b + 2) & 0xff) << 16) |
        ((bytes(b + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 1
    }
    val tail = nblocks << 2
    var k1 = 0
    if ((len & 3) >= 3) k1 ^= (bytes(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (bytes(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= bytes(tail) & 0xff
      h1 ^= mixK1(k1)
    }
    fmix(h1, len)
  }

  /** murmur3_x86_32 of the 8-byte little-endian encoding of `v` —
    * block math directly (two LE 4-byte words = low int, high int),
    * no allocation. Ints and dates widen to long first, which is WHY
    * the spec hashes ints as longs: `bucket[n]` survives an
    * int→bigint type promotion with indexes intact. */
  def hashLong(v: Long): Int = {
    var h1 = mixH1(0, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  /** Spec bucket index: non-negative hash mod n. */
  private def idx(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n

  def bucketLong(v: Long, n: Int): Int = idx(hashLong(v), n)
  def bucketBytes(v: Array[Byte], n: Int): Int = idx(hashBytes(v), n)
  def bucketString(v: UTF8String, n: Int): Int = idx(hashBytes(v.getBytes), n)
  /** Unscaled value, minimal two's-complement big-endian — exactly
    * `BigInteger.toByteArray`. The scale is the DECLARED type's scale
    * (Spark stores decimals at declared scale), so equal values hash
    * equal; precision growth leaves the unscaled value unchanged,
    * which is why decimal(p,s)→decimal(p',s) widening keeps indexes. */
  def bucketDecimal(v: org.apache.spark.sql.types.Decimal, n: Int): Int =
    idx(hashBytes(v.toJavaBigDecimal.unscaledValue.toByteArray), n)
}

/** `iceberg_bucket(col, n) -> int` — null in, null out (null sources
  * land in the null partition like every transform). Type dispatch is
  * compile-time (on the child's dtype), so each call site generates a
  * single static-call branch. */
case class IcebergBucketExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType | StringType | BinaryType |
         _: DecimalType =>
      if (n > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"bucket count must be positive, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      "iceberg_bucket supports int/long/date/timestamp/string/binary/decimal " +
        s"(the Iceberg spec's bucketable types), got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType => IcebergBucketImpl.bucketLong(input.asInstanceOf[Int].toLong, n)
    case ShortType => IcebergBucketImpl.bucketLong(input.asInstanceOf[Short].toLong, n)
    case ByteType => IcebergBucketImpl.bucketLong(input.asInstanceOf[Byte].toLong, n)
    case DateType => IcebergBucketImpl.bucketLong(input.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      IcebergBucketImpl.bucketLong(input.asInstanceOf[Long], n)
    case StringType => IcebergBucketImpl.bucketString(input.asInstanceOf[UTF8String], n)
    case BinaryType => IcebergBucketImpl.bucketBytes(input.asInstanceOf[Array[Byte]], n)
    case _: DecimalType =>
      IcebergBucketImpl.bucketDecimal(input.asInstanceOf[Decimal], n)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = "graft.functions.IcebergBucketImpl"
    child.dataType match {
      case IntegerType | ShortType | ByteType | DateType |
           LongType | TimestampType | TimestampNTZType =>
        // integral java types widen to long implicitly
        defineCodeGen(ctx, ev, c => s"$kernel.bucketLong((long) $c, $n)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$kernel.bucketString($c, $n)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"$kernel.bucketBytes($c, $n)")
      case _: DecimalType =>
        defineCodeGen(ctx, ev, c => s"$kernel.bucketDecimal($c, $n)")
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)
}

object IcebergBucket {
  /** Registered under a graft-prefixed name so the engine-internal
    * registration (re-run on every layout-expression build) can never
    * clobber a user's own session function named `iceberg_bucket`. */
  val FunctionName = "graft_iceberg_bucket"

  /** Register [[FunctionName]] in the session registry (idempotent) and
    * return a Column applying it — usable from the DataFrame API and
    * `spark.sql`. The bucket count rides as a foldable second arg. */
  def bucket(spark: SparkSession, c: Column, n: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName,
      exprs => {
        require(exprs.length == 2, s"$FunctionName(col, n) takes two arguments")
        val nLit = exprs(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"$FunctionName: n must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            s"$FunctionName: n must be a literal")
        }
        IcebergBucketExpr(exprs.head, nLit)
      },
      "built-in")
    call_function(FunctionName, c, lit(n))
  }

  /** Variant resolving the session from the thread context — for call
    * sites (the partition-layout builder) that hold only a Column. */
  def bucket(c: Column, n: Int): Column =
    bucket(SparkSession.active, c, n)
}
