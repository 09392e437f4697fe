package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{VecDot, VecSumSq}

/** Proves the vector kernels' doGenCode paths generate COMPILABLE Java
  * (GenerateUnsafeProjection.generate codegen-compiles eagerly — a bad
  * doGenCode throws here rather than silently falling back) and that
  * compiled results match the interpreted eval bit-for-bit. */
class VectorCodegenSpec extends AnyFunSuite {

  private val arrT = ArrayType(FloatType, containsNull = false)

  private def arr(xs: Float*): GenericArrayData =
    new GenericArrayData(xs.map(x => x: Any).toArray)

  test("VecDot/VecSumSq codegen compiles and matches interpreted eval") {
    val a = BoundReference(0, arrT, nullable = true)
    val b = BoundReference(1, arrT, nullable = true)
    val exprs = Seq(VecDot(Seq(a, b)), VecSumSq(Seq(a)))
    val proj = GenerateUnsafeProjection.generate(exprs) // throws on bad Java
    val row = InternalRow(arr(1.5f, -2.25f, 3f), arr(0.5f, 4f, -1f))
    val out = proj(row)
    val expDot = 1.5 * 0.5 + -2.25 * 4.0 + 3.0 * -1.0
    val expSq = 1.5 * 1.5 + 2.25 * 2.25 + 9.0
    assert(out.getDouble(0) == expDot)
    assert(out.getDouble(1) == expSq)
    assert(exprs(0).eval(row) == expDot)
    assert(exprs(1).eval(row) == expSq)
  }

  test("null inputs stay null under codegen") {
    val a = BoundReference(0, arrT, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      VecDot(Seq(a, Literal.create(null, arrT))),
      VecSumSq(Seq(Literal.create(null, arrT)))))
    val out = proj(InternalRow(arr(1f)))
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
