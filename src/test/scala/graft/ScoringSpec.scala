package graft

import graft.operators.Scoring

class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches the hand-computed integer scores and tie-breaks on id") {
    // N=3, T=8. term 'x': df=1, idf=(2e6 div 2)+1=1000001; doc a tf=2,
    // dl=3: (22*2*8) div (160+24+81)=1 -> 1000001. term 'z': df=2,
    // idf=(1e6 div 3)+1=333334; b (tf=1,dl=2): 176 div 158=1; c (tf=3,
    // dl=3): 528 div 345=1 -> both 333334, tie-break b < c.
    val docs = Seq(("a", "x x y"), ("b", "y z"), ("c", "z z z"))
      .toDF("id", "text")
    val got = Scoring.bm25(docs, "id", "text", Seq("x", "z"), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, "a", 3L, 1000001L), (2L, "b", 2L, 333334L)))
  }

  test("bm25 k larger than the corpus returns everything ranked") {
    val docs = Seq(("a", "x"), ("b", "y")).toDF("id", "text")
    val got = Scoring.bm25(docs, "id", "text", Seq("x"), 10)
    assert(got.count() === 2)
    assert(got.orderBy("rank").select("id").as[String].collect().head === "a")
  }

  test("linearScore: exact margin, bias for vocab-free docs, threshold gate") {
    val docs = Seq(("a", "good good bad"), ("b", "meh"), ("c", "bad bad"))
      .toDF("id", "text")
    val got = Scoring.linearScore(docs, "id", "text",
        Seq("good" -> 2L, "bad" -> -3L), bias = 1L, threshold = 0L)
      .orderBy("id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq(("a", 2L, true), ("b", 1L, true), ("c", -5L, false)))
  }
}
