package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** md5_minhash_sig(shingles, k) — a MinHash signature whose hash
  * family is ORACLE-EXPRESSIBLE (VERDICT r9 #2b): component
  * f ∈ [0, k) of a shingle set S is
  *
  *   min over t ∈ S of substring(md5(t ‖ ":" ‖ (f / 4)), (f % 4)·8 + 1, 8)
  *
  * i.e. each md5 of "token:block" yields four 8-hex-char components.
  * Components are lowercase fixed-width hex STRINGS, so the string min
  * is the numeric min and DuckDB's binary-collation `min` reproduces
  * every value with `substring(md5(tok || ':' || (f // 4)),
  * (f % 4) * 8 + 1, 8)` — no engine-private hashing anywhere.
  *
  * Compiled single pass: one MessageDigest update per (token, block)
  * — k/4 digests per token, not k — and all-array inner loops; the
  * equivalent nested-HOF Column form evaluates an interpreted lambda
  * per (token × family) with a fresh concat+md5 each, which measured
  * ~20× slower on the sf0.1 guard report. Used by
  * [[graft.operators.Dedup.lshGuardReportPortable]]; the engine's
  * candidate path keeps the murmur3 [[MinHashSig]].
  *
  * k must be a multiple of 4 (each md5 yields exactly four
  * components). Empty and null shingle arrays both produce the
  * non-null array of k nulls, mirroring [[MinHashSig]]'s contract.
  */
case class Md5MinHashSig(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 4 && k % 4 == 0, s"k=$k must be a positive multiple of 4")

  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType =
    ArrayType(StringType, containsNull = true)

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
    val md = Md5MinHashSig.localMd5.get()
    val blocks = k / 4
    // mins(f) holds the 8 lowercase-hex chars of the running minimum
    val mins = Array.fill(k)("ffffffff")
    val hex = new Array[Char](32)
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i).getBytes
      var blk = 0
      while (blk < blocks) {
        md.reset()
        md.update(tok)
        md.update(':'.toByte)
        // ASCII digits of blk (0..k/4-1, at most 3 digits here)
        val bs = blk.toString
        var d = 0
        while (d < bs.length) { md.update(bs.charAt(d).toByte); d += 1 }
        val dig = md.digest()
        var b = 0
        while (b < 16) {
          hex(b * 2) = Md5MinHashSig.HEX((dig(b) >> 4) & 0xf)
          hex(b * 2 + 1) = Md5MinHashSig.HEX(dig(b) & 0xf)
          b += 1
        }
        var j = 0
        while (j < 4) {
          val f = blk * 4 + j
          val comp = new String(hex, j * 8, 8)
          if (comp.compareTo(mins(f)) < 0) mins(f) = comp
          j += 1
        }
        blk += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "md5_minhash_sig"
}

object Md5MinHashSig {
  private val HEX = "0123456789abcdef".toCharArray
  private[expressions] val localMd5 =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}
