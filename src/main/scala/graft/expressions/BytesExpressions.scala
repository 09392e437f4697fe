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
