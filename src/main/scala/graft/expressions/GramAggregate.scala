package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact second-moment (Gram) aggregate over QUANTIZED vectors: given
  * an `array<long>` child of fixed length `d` (a fixed-point-quantized
  * embedding), accumulates in one pass
  *
  *   n, s_i = Σ x_i, and G_ij = Σ x_i·x_j (upper triangle i ≤ j)
  *
  * — everything a covariance / PCA fit needs — as INTEGER sums, so the
  * result is order-independent and hash-exact at any partitioning.
  *
  * The scale story: the naive route (posexplode to (i, j, x_i·x_j)
  * rows) pushes d²/2 rows per vector through the pipeline — 2,080
  * allocated rows per 64-d vector. This buffer does d²/2 fused
  * multiply-adds into one flat long array per vector; partial
  * aggregation ships ONE buffer (≈17 KB at d=64) per map task, and the
  * driver-side result is d(d+1)/2 + d + 1 longs regardless of row
  * count.
  *
  * Overflow policy: `Math.addExact`/`multiplyExact` — a quantization
  * scale too large for the corpus size fails LOUDLY, never wraps.
  * At micros scale (1e6) with |x| ≤ 1 the per-pair product is ≤ 1e12,
  * safe past 9e6 rows per final aggregate; drop the scale a digit for
  * each further 100× rows.
  */
case class GramAggregate(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(d > 0, s"gram needs d > 0, got $d")

  private val nTri = d * (d + 1) / 2
  private val bufLen = 1 + d + nTri

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("gram", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gram expects vectors of length $d, got ${arr.numElements()}")
      b(0) = Math.addExact(b(0), 1L)
      var i = 0
      var idx = 1 + d
      while (i < d) {
        val xi = arr.getLong(i)
        b(1 + i) = Math.addExact(b(1 + i), xi)
        var j = i
        while (j < d) {
          b(idx) = Math.addExact(b(idx), Math.multiplyExact(xi, arr.getLong(j)))
          j += 1
          idx += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) = Math.addExact(a(i), other(i)); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any =
    InternalRow(b(0),
      new GenericArrayData(java.util.Arrays.copyOfRange(b, 1, 1 + d)),
      new GenericArrayData(java.util.Arrays.copyOfRange(b, 1 + d, bufLen)))

  override def serialize(b: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(b.length * 8)
    b.foreach(buf.putLong)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    Array.fill(bufLen)(buf.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): GramAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GramAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): GramAggregate =
    copy(child = newChild)
  override def prettyName: String = "gram_agg"
}
