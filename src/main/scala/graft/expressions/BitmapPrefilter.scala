package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** shingle_bitmap(shh) — a fixed-width bit-set summary of a hashed
  * shingle set: element `x` (an `xxhash64` value, already uniform)
  * sets bit `x mod (words*64)` in a `words`-long array.
  *
  * Purpose: the near-dup refine's EXACT prefilter
  * ([[BitmapIntersectUpperBound]]). At the default 4 words the summary
  * is 32 bytes — ~6× narrower than a typical short document's full
  * sorted-hash array — so candidate pairs can be screened with a
  * fraction of the shuffle bytes the full-array join pays, and only
  * survivors reach it. Width is a soundness-neutral tuning knob: a
  * narrower map only makes the upper bound looser (more survivors),
  * never wrong.
  */
case class ShingleBitmap(child: Expression, words: Int)
  extends UnaryExpression with CodegenFallback {
  require(words >= 1 && words <= 1024, s"words=$words out of [1,1024]")

  private val bits = words * 64

  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      // getLong on a null element silently reads 0 — refuse to fuse
      // with nullable-element producers (same contract as the minhash
      // family over hashed shingles)
      "shingle_bitmap needs array<bigint> with non-null elements " +
        "(containsNull=false)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_bitmap needs array<bigint>, got ${t.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val out = new Array[Long](words)
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        // floorMod: hash values are uniform over the full long range,
        // so the sign fold costs nothing in dispersion
        val idx = java.lang.Math.floorMod(x, bits.toLong).toInt
        out(idx >> 6) |= (1L << (idx & 63))
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingle_bitmap"
}

/** bitmap_intersect_ub(bmA, szA, bmB, szB) — a PROVABLY SOUND upper
  * bound on |A ∩ B| for two shingle sets summarized by
  * [[ShingleBitmap]] maps of equal width, with `szA`/`szB` the true
  * (distinct-element) set sizes.
  *
  * Soundness: every shared element sets the same bit in both maps, so
  * the I shared elements occupy ≥ I − c bits of `bmA & bmB`, where c
  * is the number of within-set bit collisions among the shared subset.
  * That c is ≤ the TOTAL collision count of either set, which is
  * directly observable as sz − popcount(bm). Hence
  *
  *   |A ∩ B| ≤ popcount(bmA & bmB) + min(szA − pcA, szB − pcB)
  *
  * — no probabilistic argument anywhere, so a threshold test against
  * this bound discards only pairs whose exact Jaccard is strictly
  * below threshold. (Cross-set collisions can only INFLATE the AND
  * popcount, which loosens the bound in the safe direction.)
  */
case class BitmapIntersectUpperBound(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length != 4)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (bmA, szA, bmB, szB), got ${children.length} args")
    (children(0).dataType, children(1).dataType,
        children(2).dataType, children(3).dataType) match {
      case (ArrayType(LongType, _), IntegerType,
          ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<bigint>, int, array<bigint>, int), got " +
          children.map(_.dataType.catalogString).mkString(", "))
    }
  }

  override def eval(input: InternalRow): Any = {
    val va = children(0).eval(input)
    val vb = children(2).eval(input)
    val szA = children(1).eval(input)
    val szB = children(3).eval(input)
    // a null map or size means the pair can't be screened — return the
    // loosest sound bound so the caller keeps the pair for full refine
    if (va == null || vb == null || szA == null || szB == null)
      return Int.MaxValue
    val a = va.asInstanceOf[ArrayData]
    val b = vb.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var andPc = 0
    var pcA = 0
    var pcB = 0
    var i = 0
    while (i < n) {
      val wa = a.getLong(i)
      val wb = b.getLong(i)
      andPc += java.lang.Long.bitCount(wa & wb)
      pcA += java.lang.Long.bitCount(wa)
      pcB += java.lang.Long.bitCount(wb)
      i += 1
    }
    val ca = szA.asInstanceOf[Int] - pcA
    val cb = szB.asInstanceOf[Int] - pcB
    andPc + math.min(math.max(ca, 0), math.max(cb, 0))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String = "bitmap_intersect_ub"
}
