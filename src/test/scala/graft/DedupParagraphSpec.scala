package graft

import graft.operators.Dedup

class DedupParagraphSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minDocs: Int): Map[Long, (String, Int)] =
    Dedup.dedupParagraphs(docs.toDF("id", "text"), "id", "text",
        "\n\n", "\n\n", minDocs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap

  test("paragraphs repeated across >= minDocs documents are removed") {
    val boiler = "all rights reserved"
    val docs = (1L to 5L).map(i => (i, s"unique body $i\n\n$boiler")) :+
      (6L, "no boilerplate here")
    val got = run(docs, minDocs = 3)
    assert(got(1L) === ("unique body 1", 1))
    assert(got(5L) === ("unique body 5", 1))
    assert(got(6L) === ("no boilerplate here", 0))
  }

  test("repeats within one document do not count toward the threshold") {
    val docs = Seq(
      (1L, "spam\n\nspam\n\nspam\n\nbody one"),
      (2L, "body two"))
    // "spam" occurs 3 times but in ONE document: kept
    assert(run(docs, minDocs = 3)(1L) === ("spam\n\nspam\n\nspam\n\nbody one", 0))
    // a second document pushes distinct-doc count to 2
    val got = run(docs :+ (3L, "spam\n\nbody three"), minDocs = 2)
    assert(got(1L) === ("body one", 3))
    assert(got(3L) === ("body three", 1))
  }

  test("position order is preserved and mid-document cuts splice cleanly") {
    val docs = (1L to 3L).map(i => (i, s"head $i\n\nshared middle\n\ntail $i"))
    val got = run(docs, minDocs = 3)
    assert(got(2L) === ("head 2\n\ntail 2", 1))
  }

  test("a document whose every paragraph is boilerplate becomes empty") {
    val docs = (1L to 3L).map(i => (i, "only\n\nboiler")) :+ (4L, "only")
    val got = run(docs, minDocs = 3)
    assert(got(1L) === ("", 2))
    // "only" also appears as doc 4's whole text: 4 distinct docs
    assert(got(4L) === ("", 1))
  }
}
