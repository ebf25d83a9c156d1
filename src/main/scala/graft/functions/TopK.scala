package graft.functions

import java.nio.ByteBuffer
import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `topk_double(x) -> array<double>`: the k largest values of a group,
  * descending — a native TypedImperativeAggregate (SURVEY.md §7.3b,
  * beyond the reference's §2.10 surface which needs no UDAF).
  *
  * Why it exists at 100 TB: per-group top-k via window rank sorts and
  * shuffles EVERY row of every group; this aggregate keeps a bounded
  * k-element min-heap per group, combines partially on the map side
  * like any aggregate (each partition ships at most k values per
  * group), and the result is deterministic (value-sorted multiset —
  * duplicates included — independent of partitioning and merge order). */
case class TopKDoubleAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JPriorityQueue[java.lang.Double]]
  with UnaryLike[Expression] {
  require(k >= 1, "k >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"topk_double_$k"

  override def createAggregationBuffer(): JPriorityQueue[java.lang.Double] =
    new JPriorityQueue[java.lang.Double](k + 1) // min-heap: root = weakest

  override def update(heap: JPriorityQueue[java.lang.Double],
      input: InternalRow): JPriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (heap.size < k) heap.add(d)
      else if (heap.peek() < d) { heap.poll(); heap.add(d) }
    }
    heap
  }

  override def merge(a: JPriorityQueue[java.lang.Double],
      b: JPriorityQueue[java.lang.Double]): JPriorityQueue[java.lang.Double] = {
    val it = b.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (a.size < k) a.add(d)
      else if (a.peek() < d) { a.poll(); a.add(d) }
    }
    a
  }

  override def eval(heap: JPriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](heap.size)
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    var l = 0; var r = arr.length - 1
    while (l < r) { val t = arr(l); arr(l) = arr(r); arr(r) = t; l += 1; r -= 1 }
    new GenericArrayData(arr)
  }

  override def serialize(heap: JPriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * heap.size)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JPriorityQueue[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.add(bb.getDouble); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDoubleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDoubleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKDoubleAgg =
    copy(child = newChild)
}

object TopK {
  /** Register (name carries k — coexisting widths must not collide) and
    * apply as an aggregate Column. */
  def topkDouble(spark: SparkSession, x: Column, k: Int): Column = {
    val name = s"topk_double_$k"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => TopKDoubleAgg(exprs.head, k), "built-in")
    call_function(name, x.cast("double"))
  }
}
