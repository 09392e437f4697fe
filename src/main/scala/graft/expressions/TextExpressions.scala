package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** repetition_stats(text) — whitespace token count, distinct-token
  * count and max word-n-gram multiplicity in ONE compiled pass.
  *
  * Semantically equal to the Column formulation
  * (`TextAnalysis.topGramCount` / `dupTokenFraction` over
  * `split(trim(lower(text)), "\\s+")`), which evaluates ~5 interpreted
  * higher-order lambdas per document and re-splits the text for each
  * signal. Here the tokens are materialized once and every signal comes
  * from the same O(tokens) hash-count scan — the max-multiplicity count
  * needs no sort at all. The struct return lets one projection fan out
  * all the fractions; whole-stage codegen's subexpression elimination
  * evaluates the expression once per row.
  */
case class RepetitionStats(children: Seq[Expression], n: Int)
  extends Expression with CodegenFallback {

  require(n >= 1, s"n-gram size n=$n")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_gram", IntegerType, nullable = false)))

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    // Exactly split(trim(lower(text)), "\s+"): UTF8String.trim strips
    // 0x20 only (SQL trim — NOT java's String.trim, which also strips
    // tabs/newlines and would change token counts), toLowerCase is the
    // same mapping Lower uses, and the split is the same Java regex
    // StringSplit compiles.
    val s = v.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val toks = ws.split(s, -1)
    val distinct = new java.util.HashSet[String]()
    toks.foreach(distinct.add)
    var top = 0
    if (toks.length >= n) {
      val counts = new java.util.HashMap[String, Integer]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        val c = counts.merge(sb.toString, 1,
          (a, b) => java.lang.Integer.valueOf(a.intValue + b.intValue))
        if (c.intValue > top) top = c.intValue
        i += 1
      }
    }
    InternalRow(toks.length, distinct.size, top)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "repetition_stats"
}

/** nfc(text) — Unicode canonical composition (NFC) via
  * `java.text.Normalizer`. NFC is covered by the Unicode stability
  * policy (normalization of assigned code points never changes between
  * versions), so the result is bit-identical across runtimes — the
  * property the oracle replay through utf8proc relies on. ASCII input
  * short-circuits: `Normalizer.isNormalized` is O(n) with no
  * allocation, and real corpora are overwhelmingly already-NFC.
  */
case class NfcNormalize(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = StringType

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "nfc"
}
