package graft

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("one power step matches the hand-computed fixed-point ranks") {
    // a->b, a->c, b->a; c dangling. N=3, r0 = 10^12 div 3 each,
    // base = 15*10^12 div 300 = 5*10^10.
    // r1(a) = base + 85*(r0 div 1) div 100 = 333333333333
    // r1(b) = r1(c) = base + 85*(r0 div 2) div 100 = 191666666666
    val e = Seq(("a", "b"), ("a", "c"), ("b", "a")).toDF("src", "dst")
    val got = PageRank.ranks(e, "src", "dst", iterations = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("a" -> 333333333333L, "b" -> 191666666666L,
      "c" -> 191666666666L))
  }

  test("checkpointed deep iteration is bit-identical to the uncut plan") {
    val e = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")).toDF("src", "dst")
    val plain = PageRank.ranks(e, "src", "dst", iterations = 9)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val cut = PageRank.ranks(e, "src", "dst", iterations = 9,
        checkpointEvery = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(cut === plain)
  }

  test("duplicate edges collapse and rank mass flows to the sink hub") {
    // every node links to hub (some edges repeated); hub links back to a
    val e = Seq(("a", "hub"), ("a", "hub"), ("b", "hub"), ("c", "hub"),
      ("hub", "a")).toDF("src", "dst")
    val got = PageRank.ranks(e, "src", "dst", iterations = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("hub") > got("a") && got("a") > got("b"))
    assert(got("b") === got("c")) // symmetric spokes tie exactly
  }
}
