package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** `bloom_might_contain(hash)` — membership probe of a 64-bit key hash
  * against an immutable Bloom bit array ([[graft.operators.Bloom]]).
  *
  * The bit array rides the expression into the task binary (broadcast
  * once per stage by Spark's closure shipping) and is probed with k
  * double-hash positions; codegen keeps the probe loop inside
  * WholeStageCodegen so a 100 TB corpus prefilter is a pure map-side
  * scan column — no UDF, no shuffle, no driver round-trip.
  */
case class BloomMightContain(children: Seq[Expression],
    bits: Array[Long], k: Int)
  extends Expression {

  require(bits.nonEmpty && (bits.length & (bits.length - 1)) == 0)
  require(k >= 1)

  override def nullable: Boolean = children(0).nullable
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children(0).dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash input, got " +
        children(0).dataType.simpleString)

  private val mask = bits.length * 64L - 1L

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    val h = v.asInstanceOf[Long]
    val h2 = (h >>> 32) * 2 + 1
    var i = 0
    while (i < k) {
      val idx = (h + i * h2) & mask
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = children(0).genCode(ctx)
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val i = ctx.freshName("i")
    val h2 = ctx.freshName("h2")
    val idx = ctx.freshName("idx")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      boolean ${ev.value} = true;
      if (!${ev.isNull}) {
        long $h2 = (${c.value} >>> 32) * 2 + 1;
        for (int $i = 0; $i < $k; $i++) {
          long $idx = (${c.value} + $i * $h2) & ${mask}L;
          if (($bitsRef[(int)($idx >>> 6)] & (1L << ($idx & 63))) == 0L) {
            ${ev.value} = false; break;
          }
        }
      }""")
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "bloom_might_contain"
}
