package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** decode_bytes(payload) → array<int> of unsigned byte values.
  *
  * THE DECODE STUB of the multimodal pipeline: a real deployment would
  * invoke an image/audio codec here (JNI to turbojpeg/ffmpeg — not
  * available in this container, SURVEY north-star "multimodal columns").
  * The deterministic stand-in exposes the raw payload bytes so every
  * downstream stage — feature extraction, frame sampling, batch shapes —
  * is real, tested Spark plumbing. Swapping in a codec changes only this
  * expression's eval.
  */
case class BytesToIntArray(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) null
    else {
      val bytes = v.asInstanceOf[Array[Byte]]
      val out = new Array[Any](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
  override def prettyName: String = "decode_bytes"
}

/** resize_nearest(pixels, w, h, newW x newH) — nearest-neighbor resize
  * of a row-major w×h integer image, one eval per row.
  *
  * Exists because the Column formulation
  * (`transform(sequence(...), i => element_at(pad, ...))`) references
  * the padded-pixels column exactly once — inside the lambda — so
  * CollapseProject inlines the whole decode+pad subtree into the
  * lambda body, re-evaluating it once PER OUTPUT PIXEL (measured 64×
  * per row on the thumbnail query). Source indices are
  * floor(d·src/new) with `new` a power of two, exact in binary FP —
  * identical selection to the DuckDB oracle's integer division.
  */
case class ResizeNearest(children: Seq[Expression], newW: Int, newH: Int)
  extends Expression with CodegenFallback {

  require((newW & (newW - 1)) == 0 && (newH & (newH - 1)) == 0,
    s"resize dims must be powers of two: $newW x $newH")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val vp = children(0).eval(input)
    val vw = children(1).eval(input)
    val vh = children(2).eval(input)
    if (vp == null || vw == null || vh == null) return null
    val px = vp.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val w = vw.asInstanceOf[Number].longValue()
    val h = vh.asInstanceOf[Number].longValue()
    val out = new Array[Any](newW * newH)
    var i = 0
    while (i < newW * newH) {
      val dy = i / newW
      val dx = i % newW
      val sy = dy * h / newH
      val sx = dx * w / newW
      out(i) = px.getInt((sy * w + sx).toInt)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "resize_nearest"
}

/** stride_sample(pixels, k) — every k-th element (positions 0, k, 2k,
  * …), one eval per row. Same CollapseProject rationale as
  * [[ResizeNearest]]: the `transform(sequence(0, n-1, k),
  * i => element_at(pixels, i+1))` form re-evaluates a computed pixels
  * subtree per sampled element. */
case class StrideSample(children: Seq[Expression], stride: Int)
  extends Expression with CodegenFallback {

  require(stride >= 1, s"stride=$stride")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val px = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = px.numElements()
    val out = new Array[Any]((n + stride - 1) / stride)
    var i = 0
    var j = 0
    while (i < n) { out(j) = px.getInt(i); i += stride; j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "stride_sample"
}
