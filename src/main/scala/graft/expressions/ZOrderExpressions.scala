package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Morton (Z-order) interleaving of N long keys, `bits` bits each —
  * the multi-dimensional clustering key used for data layout at scale
  * (the same curve Delta's OPTIMIZE ZORDER BY and Iceberg's
  * sort-order Z feed to their writers).
  *
  * Sorting/range-partitioning a 100 TB table by this value makes every
  * output file cover a small HYPER-RECTANGLE of the key space, so a
  * conjunctive range predicate on ANY subset of the dimensions maps to
  * a contiguous set of files and parquet footer min/max stats prune the
  * rest — one layout serves all dimensions instead of one sort column
  * serving only itself.
  *
  * bit b of input c lands at output position `b * n + c`; inputs are
  * masked to `bits` bits (values must be pre-normalized into
  * [0, 2^bits)); n * bits ≤ 63 keeps the result a nonnegative long.
  * Null inputs yield null (sort them to one end explicitly).
  */
case class ZOrderValue(children: Seq[Expression], bits: Int)
  extends Expression {

  require(children.nonEmpty && children.size * bits <= 63,
    s"zorder: ${children.size} dims x $bits bits must fit 63 bits")

  override def nullable: Boolean = children.exists(_.nullable)
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  private val n = children.size
  private val mask = (1L << bits) - 1L

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      if (v == null) return null
      val m = v.asInstanceOf[Long] & mask
      var b = 0
      while (b < bits) {
        z |= ((m >>> b) & 1L) << (b * n + c)
        b += 1
      }
      c += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val m = ctx.freshName("m")
    val b = ctx.freshName("b")
    val interleave = evals.zipWithIndex.map { case (e, c) =>
      s"""{
         |  long $m = ${e.value} & ${mask}L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    ${ev.value} |= (($m >>> $b) & 1L) << ($b * $n + $c);
         |  }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        ${evals.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = ${evals.map(_.isNull).mkString(" || ")};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          $interleave
        }
      """)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "zorder_value"
}
