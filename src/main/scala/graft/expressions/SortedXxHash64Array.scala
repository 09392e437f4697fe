package graft.expressions

import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** sorted_xxhash64_array(arr) — `sort_array(transform(arr,
  * xxhash64(_)))` in ONE row-local pass: hash every string element
  * with `XxHash64Function` (seed 42, exactly what the `xxhash64`
  * builtin folds through) into a primitive long array and
  * `Arrays.sort` it.
  *
  * Why it exists: the near-dup pipeline's hottest projection turns a
  * document's shingle set into its sorted hashed form
  * ([[graft.operators.Dedup.hashedShingles]]); the HOF spelling
  * evaluates an INTERPRETED lambda per element (tens of millions of
  * rows × ~10²-element arrays at corpus scale), while this expression
  * walks the array once with no per-element dispatch.
  *
  * Parity contract (spec-pinned bit for bit against the HOF form):
  * null input → null; empty → empty; a NULL ELEMENT hashes to the
  * seed (42L) — the `xxhash64` builtin returns its seed unchanged for
  * a null child value, and `sort_array` then sorts the longs, so no
  * null ever survives into the output. */
case class SortedXxHash64Array(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_xxhash64_array needs array<string>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 42L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedXxHash64Array =
    copy(child = newChild)
}
