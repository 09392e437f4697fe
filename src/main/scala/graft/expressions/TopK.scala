package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties → smallest id) and returns them best-first as
  * `array<struct<neighbor_id long, cos_sim double>>`.
  *
  * The scale story (SURVEY north-star, VERDICT r1 "single-task top-k"):
  * a window `row_number() OVER (PARTITION BY query_id ORDER BY score)`
  * funnels every scored candidate of a query into ONE task. This
  * aggregate instead rides Spark's partial aggregation — each map task
  * keeps ≤ k pairs per group, the shuffle carries k·groups rows, and the
  * final merge is O(k log k) per group.
  *
  * Input child: `struct(score double, id long)`.
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with UnaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  /** Heap ordering with the WORST pair at the head (dequeued first):
    * lower score is worse; equal score, larger id is worse. */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(x: (Double, Long), y: (Double, Long)): Int = {
        val c = java.lang.Double.compare(y._1, x._1)
        if (c != 0) c else java.lang.Long.compare(x._2, y._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def push(b: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    b.enqueue(e)
    if (b.size > k) b.dequeue()
  }

  override def update(b: mutable.PriorityQueue[(Double, Long)],
      row: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[InternalRow]
      if (!s.isNullAt(0) && !s.isNullAt(1)) push(b, (s.getDouble(0), s.getLong(1)))
    }
    b
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(push(a, _))
    a
  }

  override def eval(b: mutable.PriorityQueue[(Double, Long)]): Any = {
    if (b.isEmpty) return null
    // dequeueAll yields worst-first; reverse for best-first rank order
    val sorted = b.clone().dequeueAll.reverse
    new GenericArrayData(sorted.map { case (score, id) =>
      InternalRow(id, score)
    }.toArray[Any])
  }

  override def serialize(b: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + b.size * 16)
    buf.putInt(b.size)
    b.foreach { case (s, i) => buf.putDouble(s); buf.putLong(i) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = createAggregationBuffer()
    (0 until n).foreach(_ => b.enqueue((buf.getDouble, buf.getLong)))
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): TopKByScore =
    copy(child = newChild)
  override def prettyName: String = "top_k_by_score"
}
