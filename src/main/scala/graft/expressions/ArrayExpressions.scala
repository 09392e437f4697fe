package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sorted_long_intersect_count(a, b) — |a ∩ b| for two ASCENDING-sorted
  * long arrays with distinct elements, by linear merge. The 64-bit twin
  * of [[SortedIntersectCount]]: the near-dup refine joins hash each
  * shingle to `xxhash64` BEFORE the candidate join, so the (largest)
  * shuffle of the pipeline carries 8-byte elements instead of shingle
  * strings (~2.5x fewer bytes at 3-word shingles) and the merge
  * compares primitives instead of UTF8Strings.
  */
case class SortedLongIntersectCount(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = IntegerType

  // getLong on a non-long array reads garbage SILENTLY (unsafe array
  // storage has no per-element tag) — reject wrong inputs at analysis
  // time instead of returning a plausible wrong count
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (children.length != 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 2 arguments, got ${children.length}")
    else children.map(_.dataType).find {
      case ArrayType(LongType, _) => false
      case _ => true
    } match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<bigint> inputs, got ${bad.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): Any = {
    val va = children(0).eval(input)
    val vb = children(1).eval(input)
    if (va == null || vb == null) return null
    val a = va.asInstanceOf[ArrayData]
    val b = vb.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
  override def prettyName: String = "sorted_long_intersect_count"
}

/** sorted_intersect_count(a, b) — |a ∩ b| for two ASCENDING-sorted
  * string arrays with distinct elements, by linear merge.
  *
  * The refine step of every set-similarity operator computes Jaccard
  * over shingle sets; builtin `array_intersect`/`array_union` build a
  * hash set of UTF8Strings per row per side (measured: the dominant
  * cost of the whole near-dup pipeline). The inputs are already
  * `array_sort(array_distinct(...))` products, so a merge does it
  * allocation-free: |a ∪ b| = |a| + |b| − |a ∩ b|.
  */
case class SortedIntersectCount(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = IntegerType

  override def eval(input: InternalRow): Any = {
    val va = children(0).eval(input)
    val vb = children(1).eval(input)
    if (va == null || vb == null) return null
    val a = va.asInstanceOf[ArrayData]
    val b = vb.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
  override def prettyName: String = "sorted_intersect_count"
}
