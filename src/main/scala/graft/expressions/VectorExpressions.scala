package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense float-vector kernels for the similarity-search operators.
  *
  * The pure-Column formulation (`aggregate(zip_with(a, b, _ * _), ...)`)
  * evaluates its lambda interpreted, per element, with boxing — measured
  * as the dominant cost of candidate scoring. These expressions run the
  * identical arithmetic (sequential left-to-right double accumulation
  * after an exact float→double widening per element, so results are
  * bit-for-bit the values the HOF chain produced and the DuckDB oracle
  * recomputes) as a tight primitive loop over the ArrayData.
  *
  * Inputs must be array<float> with no null elements (embedding columns).
  */
case class VecDot(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val va = children(0).eval(input)
    val vb = children(1).eval(input)
    if (va == null || vb == null) return null
    val a = va.asInstanceOf[ArrayData]
    val b = vb.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
  override def prettyName: String = "vec_dot"
}

/** Σ xᵢ² of a float array — sequential double accumulation (the caller
  * takes `sqrt` in Column space, mirroring the HOF formulation). */
case class VecSumSq(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val va = children(0).eval(input)
    if (va == null) return null
    val a = va.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
  override def prettyName: String = "vec_sumsq"
}
