package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Murmur3HashFunction, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** minhash_sig(shingles, k) — the k-family MinHash signature in ONE
  * compiled pass over the shingle array.
  *
  * Value-identical to the Column formulation
  * `array((0 until k).map(seed => array_min(transform(sh, s =>
  * hash(s, lit(seed))))))`: Spark's `hash(s, lit(seed))` folds its
  * children through Murmur3 — the string hashed once with the function
  * seed 42, then the seed literal mixed in with one integer hash — so
  * this expression calls the same `Murmur3HashFunction` steps in the
  * same order and reproduces every signature value bit for bit (the
  * band hashes and the DuckDB-checked downstream stay unchanged).
  *
  * Why it exists: the HOF form evaluates an interpreted lambda per
  * (element × family) and re-hashes the string k times; the
  * explode+groupBy form codegens but pays a shuffle. Here each shingle
  * is hashed ONCE and each family adds one 32-bit mix — no lambda, no
  * shuffle — which is what the per-row STREAMING gate needs (signatures
  * must be a stateless row-local chain).
  *
  * Empty AND null shingle arrays both produce the non-null array of k
  * nulls — exactly what the HOF form yields (`transform(null, …)` is
  * null, `array_min(null)` is null, and `array(…)` over k nulls is a
  * non-null array), so the bit-for-bit-parity claim covers null input
  * too (ADVICE r8: the default unary null pass-through diverged here).
  */
abstract class MinHashSigBase extends UnaryExpression with CodegenFallback {
  def k: Int

  /** Base hash of element `i` — the `h1` each family mixes with. */
  protected def baseHash(arr: ArrayData, i: Int): Long

  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = true)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.fill[Any](k)(null))
    else nullSafeEval(v)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0)
      return new GenericArrayData(Array.fill[Any](k)(null))
    val mins = Array.fill(k)(Int.MaxValue)
    var i = 0
    while (i < n) {
      // hash(x, lit(seed)): h1 = murmur3(x, 42); h2 = murmur3(seed, h1)
      val h1 = baseHash(arr, i)
      var f = 0
      while (f < k) {
        val v = Murmur3HashFunction.hash(f, IntegerType, h1).toInt
        if (v < mins(f)) mins(f) = v
        f += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }
}

case class MinHashSig(child: Expression, k: Int) extends MinHashSigBase {
  require(k >= 1, s"k=$k")

  override protected def baseHash(arr: ArrayData, i: Int): Long =
    Murmur3HashFunction.hash(arr.getUTF8String(i), StringType, 42L)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
