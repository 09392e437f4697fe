package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** int128_sum_product(x: long, y: long) — exact Σ(x·y) accumulated in
  * 128 bits as a [[DeclarativeAggregate]]: the per-row 64×64→128-bit
  * product is Hacker's-Delight mulhi (shift/mask/multiply long ops, the
  * same decomposition `Math.multiplyHigh` uses) and the accumulator is
  * the [[Int128Sum]] two-long carry pair — all codegen'd 64-bit
  * arithmetic, zero allocation per row.
  *
  * This replaces `sum(x_dec * y_dec)` over decimal(38,0) casts (the
  * last per-row BigDecimal arithmetic in the tree, VERDICT r16 Next
  * #5): a precision-38 decimal never takes Decimal's compact-long
  * form, so the stock plan allocated a BigDecimal per row for the
  * MULTIPLY and another for the sum's add.
  *
  * Value contract: identical to the decimal form for long inputs —
  * the signed 128-bit product of two longs is exact (|x·y| ≤ 2^126),
  * null if EITHER side is null (decimal multiply semantics), skipped
  * by the sum exactly as nulls were; empty/all-null group yields NULL.
  * The TRUE sum must fit 128 bits (|Σ| < 2^127 vs the decimal form's
  * 10^38 — the same order of headroom). Emitted as decimal(38,0), so
  * downstream decimal math (`n·sxy − sx·sy`, one row per GROUP) and
  * casts round exactly as before.
  */
case class Int128SumProduct(left: Expression, right: Expression)
  extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)

  // non-long children would silently mis-multiply through the wrapping
  // mulhi decomposition — reject at analysis time, here
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two bigint inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  // LEGACY eval mode throughout: the lo-word/partial-product arithmetic
  // MUST wrap (Spark 4's ANSI default Add/Multiply throw on overflow)
  private def addL(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)
  private def mulL(a: Expression, b: Expression): Expression =
    Multiply(a, b, EvalMode.LEGACY)

  private def carryOut(a: Expression, b: Expression,
      sum: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b),
        BitwiseAnd(BitwiseOr(a, b), BitwiseNot(sum))),
      Literal(63))

  /** High 64 bits of the signed 128-bit product x·y — the
    * Math.multiplyHigh decomposition in Catalyst long ops:
    * {{{
    *   x1 = x >> 32; x2 = x & M; y1 = y >> 32; y2 = y & M
    *   t  = x1·y2 + (x2·y2 >>> 32)
    *   z1 = (t & M) + x2·y1
    *   hi = x1·y1 + (t >> 32) + (z1 >> 32)
    * }}} */
  private def mulHi(x: Expression, y: Expression): Expression = {
    val m = Literal(0xFFFFFFFFL)
    val x1 = ShiftRight(x, Literal(32))
    val x2 = BitwiseAnd(x, m)
    val y1 = ShiftRight(y, Literal(32))
    val y2 = BitwiseAnd(y, m)
    val t = addL(mulL(x1, y2),
      ShiftRightUnsigned(mulL(x2, y2), Literal(32)))
    val z1 = addL(BitwiseAnd(t, m), mulL(x2, y1))
    addL(addL(mulL(x1, y1), ShiftRight(t, Literal(32))),
      ShiftRight(z1, Literal(32)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // a null on EITHER side is a null product: adds 0, leaves `seen`
    // untouched — exactly sum(x_dec * y_dec)'s skip rule
    val bothSet = And(IsNotNull(left), IsNotNull(right))
    val xv = If(bothSet, left, Literal(0L))
    val yv = If(bothSet, right, Literal(0L))
    val pLo = mulL(xv, yv)
    val pHi = mulHi(xv, yv)
    val newLo = addL(lo, pLo)
    Seq(
      addL(addL(hi, pHi), carryOut(lo, pLo, newLo)),
      newLo,
      Or(seen, bothSet))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = addL(lo.left, lo.right)
    Seq(
      addL(addL(hi.left, hi.right), carryOut(lo.left, lo.right, newLo)),
      newLo,
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression = {
    // hi·2^64 + (lo as unsigned), assembled in decimal(38,0) ONCE per
    // group — identical to Int128Sum's emit
    val dec = DecimalType(38, 0)
    val two64 = Literal(Decimal(BigDecimal(2).pow(64), 38, 0), dec)
    val loDec = Cast(lo, dec)
    val loU = If(GreaterThanOrEqual(lo, Literal(0L)),
      loDec, addL(two64, loDec))
    val total = addL(mulL(Cast(hi, dec), two64), loU)
    If(seen, total, Literal(null, dec))
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Int128SumProduct =
    copy(left = c(0), right = c(1))
  override def prettyName: String = "int128_sum_product"
}
