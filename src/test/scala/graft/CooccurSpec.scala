package graft

import org.apache.spark.sql.Row

import graft.operators.Cooccur

/** Pins [[Cooccur.topPairs]] against a hand-computed corpus.
  *
  * Corpus: doc1 = "a b a c", doc2 = "b b".
  * Unigrams: a=2, b=3, c=1; N=6.
  * Pairs within maxDist=2 (canonicalized unordered):
  *   doc1 d=1: (a,b),(a,b),(a,c); d=2: (a,a),(b,c)
  *   doc2 d=1: (b,b); d=2: none (only 2 tokens)
  * → (a,b)=2, (a,a)=1, (a,c)=1, (b,b)=1, (b,c)=1.
  * ratio_ppm = (n_ab·N·10⁶) div (n_a·n_b):
  *   (a,b): 12e6 div 6 = 2000000    (a,a): 6e6 div 4 = 1500000
  *   (a,c): 6e6 div 2 = 3000000     (b,b): 6e6 div 9 = 666666
  *   (b,c): 6e6 div 3 = 2000000
  */
class CooccurSpec extends SparkSpec {

  test("topPairs matches hand-computed pair counts and integer PMI") {
    import spark.implicits._
    val docs = Seq("a b a c", "b b").toDF("text")
    val got = Cooccur.topPairs(docs, "text", maxDist = 2, topK = 100)
      .collect().toSeq
    val want = Seq(
      Row("a", "b", 2L, 2L, 3L, 2000000L),
      Row("a", "a", 1L, 2L, 2L, 1500000L),
      Row("a", "c", 1L, 2L, 1L, 3000000L),
      Row("b", "b", 1L, 3L, 3L, 666666L),
      Row("b", "c", 1L, 3L, 1L, 2000000L))
    assert(got === want)
  }

  test("topK truncates after the deterministic (n_ab desc, a, b) order") {
    import spark.implicits._
    val docs = Seq("a b a c", "b b").toDF("text")
    val got = Cooccur.topPairs(docs, "text", maxDist = 2, topK = 2)
      .select("a", "b").as[(String, String)].collect().toSeq
    assert(got === Seq(("a", "b"), ("a", "a")))
  }

  test("maxDist=1 sees only adjacent pairs") {
    import spark.implicits._
    val docs = Seq("a b a c").toDF("text")
    val got = Cooccur.topPairs(docs, "text", maxDist = 1, topK = 100)
      .select("a", "b", "n_ab").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("a", "b", 2L), ("a", "c", 1L)))
  }

  test("single-token and empty-ish docs produce no pairs but count unigrams") {
    import spark.implicits._
    val docs = Seq("solo", "x y").toDF("text")
    val got = Cooccur.topPairs(docs, "text", maxDist = 2, topK = 10)
      .collect().toSeq
    // N = 3 (solo, x, y); only pair is (x,y): 1·3e6 div 1 = 3000000.
    assert(got === Seq(Row("x", "y", 1L, 1L, 1L, 3000000L)))
  }
}
