package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** int128_sum(v: long) — exact 128-bit integer sum as a
  * [[DeclarativeAggregate]]: the accumulator is two LONG buffer slots
  * (two's-complement hi/lo with explicit carry arithmetic), so the
  * per-row update is ~8 codegen'd 64-bit ops with zero allocation.
  *
  * This replaces `sum(cast(v as decimal(38,0)))` in the fixed-point
  * helpers ([[graft.util.Exact]]): a decimal(38,0) is BigDecimal-backed
  * (precision > 18 never takes Decimal's compact-long form), so the
  * stock sum allocated and added java.math.BigDecimal objects per row —
  * measured ~134 ns/row, +1.5 s on geo_distance_join's 11.15 M refined
  * pairs alone (r16, tools/DistAttr).
  *
  * Value contract: identical to the decimal sum for every input whose
  * per-value magnitude fits a long (|v| < 2^63 — the fixed-point
  * helpers' stated domain) as long as the TRUE sum fits 128 bits
  * (|Σv| < 2^127, vs the decimal form's 10^38 — the same order of
  * bound). Like the stock sum: null inputs are skipped, an empty or
  * all-null group yields NULL. The result is emitted as decimal(38,0)
  * (built once per group from hi/lo), so caller-side `.cast("double")`
  * rounds exactly as the decimal path did.
  */
case class Int128Sum(child: Expression)
  extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)

  // a non-long child would silently mis-add through the bitwise carry
  // ops — reject at analysis time, right here in this expression's
  // checkInputDataTypes
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint input, got ${child.dataType.catalogString}")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  // every Add/Multiply here is constructed in LEGACY eval mode: the
  // lo-word addition MUST wrap (that is the 128-bit carry algorithm),
  // and Spark 4's session default is ANSI, whose Add throws on long
  // overflow instead of wrapping
  private def addL(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)
  private def mulL(a: Expression, b: Expression): Expression =
    Multiply(a, b, EvalMode.LEGACY)

  /** Carry-out of the unsigned 64-bit addition a + b = sum:
    * MSB of ((a & b) | ((a | b) & ~sum)). */
  private def carryOut(a: Expression, b: Expression,
      sum: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b),
        BitwiseAnd(BitwiseOr(a, b), BitwiseNot(sum))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    // null input adds 0 and leaves `seen` untouched — sum's skip rule
    val v = If(IsNull(child), Literal(0L), child)
    val newLo = addL(lo, v)
    // sign-extended high word of the 128-bit addend: 0 or -1
    val vHi = ShiftRight(v, Literal(63))
    Seq(
      addL(addL(hi, vHi), carryOut(lo, v, newLo)),
      newLo,
      Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = addL(lo.left, lo.right)
    Seq(
      addL(addL(hi.left, hi.right), carryOut(lo.left, lo.right, newLo)),
      newLo,
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression = {
    // hi*2^64 + (lo as unsigned), assembled in decimal(38,0) ONCE per
    // group. |true sum| < 10^38 by the documented contract, same as
    // the decimal-sum path it replaces.
    val dec = DecimalType(38, 0)
    val two64 = Literal(Decimal(BigDecimal(2).pow(64), 38, 0), dec)
    val loDec = Cast(lo, dec)
    val loU = If(GreaterThanOrEqual(lo, Literal(0L)),
      loDec, addL(two64, loDec))
    val total = addL(mulL(Cast(hi, dec), two64), loU)
    If(seen, total, Literal(null, dec))
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Int128Sum = copy(child = c(0))
  override def prettyName: String = "int128_sum"
}
