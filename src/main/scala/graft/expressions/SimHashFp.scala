package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** simhash_fp(text, bits) — the whole SimHash fingerprint (Charikar
  * 2002) in ONE compiled pass per row: tokenize, distinct, md5-derive a
  * `bits`-bit hash per token, accumulate ±1 votes per bit, assemble the
  * fingerprint. No explode, no shuffle, no interpreted lambda.
  *
  * Value parity is pinned to the previous explode + `bits`-aggregate
  * formulation (and to the DuckDB oracle that replays it):
  * - tokens = `split(trim(lower(text)), "\s+")` semantics — SQL trim
  *   (0x20 only, NOT java trim), UTF8String lowercase, Java regex
  *   split; first-occurrence-distinct (order is irrelevant to votes);
  * - token hash = first `bits`/4 hex nibbles of md5(token) parsed
  *   base-16 (exactly `conv(substring(md5(t),1,bits/4),16,10)`), md5
  *   over UTF-8 bytes;
  * - bit i set iff Σ(±1 votes of hash bit i) > 0.
  *
  * A NULL text yields fingerprint 0, matching the aggregate path's
  * null-vote fall-through (`when(v > 0, ...).otherwise(0)` over
  * all-null sums).
  */
case class SimHashFp(child: Expression, bits: Int)
  extends UnaryExpression with CodegenFallback {

  require(bits % 4 == 0 && bits <= 60, s"simhash bits=$bits")

  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = LongType

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  // per-instance digest (expression trees deserialize per task, the
  // same discipline WinnowFingerprints uses) — not per row
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val s = v.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val toks = ws.split(s, -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](bits)
    val nibbles = bits / 4
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      if (seen.add(t)) {
        md.reset()
        val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first `nibbles` hex chars of the digest, parsed base 16 —
        // nibble j is the high (j even) or low (j odd) half of byte j/2
        var h = 0L
        var j = 0
        while (j < nibbles) {
          val b = dig(j / 2) & 0xff
          val nib = if (j % 2 == 0) b >>> 4 else b & 0xf
          h = (h << 4) | nib
          j += 1
        }
        var i = 0
        while (i < bits) {
          votes(i) += (((h >>> i) & 1L).toInt * 2 - 1)
          i += 1
        }
      }
      ti += 1
    }
    var fp = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}
