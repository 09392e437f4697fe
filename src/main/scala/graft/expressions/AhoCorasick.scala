package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** multi_pattern_count(text) — occurrences of EVERY pattern of a
  * constructor-supplied blocklist in ONE pass over the text (classic
  * Aho–Corasick automaton: goto/failure/output links, built once per
  * executor), emitted as a count array aligned with the pattern list.
  * Overlapping and nested matches all count — every (position,
  * pattern) match is one hit, exactly the semantics of scanning every
  * start offset per pattern, which is how the DuckDB oracle replays it.
  *
  * The pipeline role is blocklist / phrase filtering (bad-word lists,
  * licence headers, policy phrases) where P patterns would otherwise
  * cost P regex passes over 100 TB of text: the automaton is
  * O(chars + matches) regardless of P, runs as a pure map-side
  * projection, and only the counts (P longs) ever reach a shuffle.
  * Matching is case-insensitive (text and patterns both lowercased —
  * the same `lower()` mapping the oracle applies).
  */
case class MultiPatternCount(children: Seq[Expression], patterns: Seq[String])
  extends Expression with CodegenFallback {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty")
  require(patterns.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.length == patterns.length,
    "duplicate pattern (after lowercasing)")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private final class Node {
    val next = new java.util.HashMap[Character, Node](4)
    var fail: Node = null
    var outputs: List[Int] = Nil // pattern indices ending here
  }

  @transient private lazy val root: Node = {
    val r = new Node
    patterns.map(_.toLowerCase(java.util.Locale.ROOT)).zipWithIndex.foreach { case (p, idx) =>
      var n = r
      p.foreach { c =>
        var k = n.next.get(c)
        if (k == null) { k = new Node; n.next.put(c, k) }
        n = k
      }
      n.outputs ::= idx
    }
    // BFS failure links; merge output chains so each node carries every
    // pattern that ends at its position (suffix patterns included)
    val q = new java.util.ArrayDeque[Node]()
    r.fail = r
    r.next.values().forEach { n => n.fail = r; q.add(n) }
    while (!q.isEmpty) {
      val u = q.poll()
      u.next.forEach { (c, v) =>
        var f = u.fail
        while ((f ne r) && f.next.get(c) == null) f = f.fail
        val cand = f.next.get(c)
        v.fail = if (cand != null && (cand ne v)) cand else r
        v.outputs = v.outputs ::: v.fail.outputs
        q.add(v)
      }
    }
    r
  }

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String].toLowerCase.toString
    val counts = new Array[Long](patterns.length)
    var node = root
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      var moved = node.next.get(c)
      while (moved == null && node != root) {
        node = node.fail
        moved = node.next.get(c)
      }
      node = if (moved != null) moved else root
      var out = node.outputs
      while (out.nonEmpty) { counts(out.head) += 1; out = out.tail }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: java.lang.Long).toArray[Any])
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "multi_pattern_count"
}
