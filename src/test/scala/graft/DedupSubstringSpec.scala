package graft

import graft.operators.Dedup

/** Cross-document repeated-substring spans: exact recovery of planted
  * shared paragraphs, doc-count (not occurrence-count) thresholding,
  * span merging, and short-document safety. */
class DedupSubstringSpec extends SparkSpec {
  import spark.implicits._

  private def spans(rows: Seq[(Long, String)], gramLen: Int, minDocs: Int) =
    Dedup.repeatedSubstringSpans(
      rows.toDF("doc_id", "text"), "doc_id", "text", gramLen, minDocs)
      .as[(Long, Int, Int)].collect().toSeq.sorted

  test("planted shared paragraph is recovered at each doc's offset") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens
    val docs = (0L until 10L).map { i =>
      // unique filler words around the paragraph, offset varies per doc
      val pre = (0 until (i.toInt % 4)).map(j => s"u${i}x$j").mkString(" ")
      val post = s"tail${i}a tail${i}b"
      (i, s"$pre $shared $post".trim)
    }
    val got = spans(docs, gramLen = 3, minDocs = 10)
    val want = docs.map { case (i, _) =>
      val off = i.toInt % 4
      (i, off, off + 6)
    }.sorted
    assert(got == want)
  }

  test("threshold counts distinct documents, not occurrences") {
    // the phrase repeats 5 times inside each of two docs — 10
    // occurrences but only 2 documents, so minDocs=3 finds nothing
    val phrase = "one two three four"
    val docs = Seq(
      (1L, Seq.fill(5)(phrase).mkString(" ")),
      (2L, Seq.fill(5)(phrase).mkString(" ")))
    assert(spans(docs, gramLen = 3, minDocs = 3).isEmpty)
    assert(spans(docs, gramLen = 3, minDocs = 2).nonEmpty)
  }

  test("overlapping repeated regions merge into one span") {
    // group A shares "a b c d", group B shares "c d e f"; the bridge
    // doc contains "a b c d e f" — its hits merge into a single span
    val a = (10L until 20L).map(i => (i, s"pre$i a b c d post$i"))
    val b = (20L until 30L).map(i => (i, s"pre$i c d e f post$i"))
    val bridge = Seq((1L, "a b c d e f"))
    val got = spans(a ++ b ++ bridge, gramLen = 3, minDocs = 10)
    assert(got.filter(_._1 == 1L) == Seq((1L, 0, 6)))
    // group docs: span covers their 4 shared tokens at offset 1
    assert(got.filter(_._1 == 15L) == Seq((15L, 1, 5)))
  }

  test("documents shorter than the gram are ignored") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, ""), (4L, "a b"))
    assert(spans(docs, gramLen = 3, minDocs = 2).isEmpty)
  }

  test("removeRepeatedSubstrings cuts the spans and preserves the rest, case intact") {
    // shared 3-gram across 3 docs; surrounding tokens unique per doc.
    // Mixed case in the UNIQUE part must survive byte-identical
    // (matching is lowercased, surgery is not).
    val docs = Seq(
      (1L, "Keep1 shared run here Tail1"),
      (2L, "Keep2 shared run here Tail2"),
      (3L, "Keep3 shared run here Tail3"),
      (4L, "solo document without repeats"))
    val got = Dedup.removeRepeatedSubstrings(
        docs.toDF("doc_id", "text"), "doc_id", "text", gramLen = 3, minDocs = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1L, "Keep1 Tail1", 3L)))
    assert(got(1) === ((2L, "Keep2 Tail2", 3L)))
    assert(got(2) === ((3L, "Keep3 Tail3", 3L)))
    assert(got(3) === ((4L, "solo document without repeats", 0L)))
  }
}
