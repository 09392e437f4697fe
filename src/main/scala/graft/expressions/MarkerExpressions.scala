package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared tokenizer for the marker-count expressions: EXACTLY the
  * `split(trim(lower(text)), "\s+")` column chain they replace — SQL
  * trim (0x20 only, NOT java trim), UTF8String lowercase, Java regex
  * split keeping trailing empties (split limit −1). The same parity
  * contract [[SimHashFp]] documents. */
private[expressions] object MarkerTok {
  val ws: java.util.regex.Pattern = java.util.regex.Pattern.compile("\\s+")
  def tokens(v: Any): Array[String] =
    ws.split(v.asInstanceOf[UTF8String].trim().toLowerCase.toString, -1)
}

/** marker_counts(text) — per marker-list hit counts (duplicates
  * counted) over whitespace tokens of `trim(lower(text))`, in ONE
  * compiled pass. Replaces N copies of the
  * `size(filter(split(trim(lower(text)),'\s+'), t → t.isInCollection(L)))`
  * chain, each of which re-tokenized the document and ran an
  * INTERPRETED lambda (higher-order functions have no codegen) with a
  * linear In-list per token. Value parity per list: count of tokens
  * equal to any member (token equality on the lowered token, as the
  * filter's UTF8String comparison did). NULL text → NULL, matching
  * `size(filter(NULL, …))` under non-legacy sizeOfNull. */
case class MarkerCounts(child: Expression, lists: Seq[Seq[String]])
  extends UnaryExpression with CodegenFallback {

  require(lists.nonEmpty, "marker_counts needs at least one list")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // token → indices of the lists containing it (marker lists are tiny
  // and literal, so the map is per-instance, built once per task)
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    lists.zipWithIndex.foreach { case (l, i) =>
      l.foreach { t =>
        val prev = m.get(t)
        m.put(t, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val toks = MarkerTok.tokens(v)
    val counts = new Array[Int](lists.length)
    var i = 0
    while (i < toks.length) {
      val hit = lookup.get(toks(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
  override def prettyName: String = "marker_counts"
}

/** lang_id(text) — the marker-profile language winner in ONE compiled
  * pass. Replaces the former 5-way column chain (one tokenize +
  * interpreted filter per language, then array_max over
  * struct(score, lang)) with a single tokenize + one hash lookup per
  * token. Value parity with that chain:
  * - score per language = duplicate-counting marker hits ([[MarkerCounts]]);
  * - winner = max by (score, lang) — langs iterated in ascending code
  *   order, ties replaced by the later (lexicographically larger)
  *   code, exactly the struct comparison array_max performed;
  * - best score ≤ 0 → "und"; NULL text → "und" (the old chain's
  *   `when(NULL > 0, …).otherwise("und")` fall-through). */
case class LangId(child: Expression, markers: Map[String, Seq[String]])
  extends UnaryExpression with CodegenFallback {

  require(markers.nonEmpty, "lang_id needs at least one language")

  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = StringType

  @transient private lazy val langs: Array[String] =
    markers.keys.toSeq.sorted.toArray
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    langs.zipWithIndex.foreach { case (l, i) =>
      markers(l).foreach { t =>
        val prev = m.get(t)
        m.put(t, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }
  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val langU: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return und
    val toks = MarkerTok.tokens(v)
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val hit = lookup.get(toks(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    // ascending lang order: >= keeps the later (larger) code on ties,
    // matching array_max's struct(score, lang) comparison
    var best = 0
    i = 1
    while (i < counts.length) {
      if (counts(i) >= counts(best)) best = i
      i += 1
    }
    if (counts(best) > 0) langU(best) else und
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}
