package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Product quantization: hand-computed codebooks, codes, and ADC
  * distances on a 4-dim corpus split into two 2-dim subspaces. */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (0L, Array(0f, 0f, 10f, 10f)),
    (1L, Array(1f, 1f, 0f, 0f)),
    (2L, Array(0.9f, 0.9f, 9f, 9f)),
    (3L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")

  test("codebook slices the k smallest-id vectors per subspace") {
    val books = Ann.pqCodebook(corpus, "vec_id", "embedding", m = 2, k = 2)
    assert(books.length === 2)
    assert(books(0).map(_.toSeq).toSeq === Seq(Seq(0f, 0f), Seq(1f, 1f)))
    assert(books(1).map(_.toSeq).toSeq === Seq(Seq(10f, 10f), Seq(0f, 0f)))
  }

  test("encode picks the nearest sub-codebook entry, ties to smaller code") {
    val books = Ann.pqCodebook(corpus, "vec_id", "embedding", m = 2, k = 2)
    val codes = Ann.pqEncode(corpus, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) === Seq(0, 0))
    assert(codes(1L) === Seq(1, 1))
    // id 2: sub0 dist .02 to [1,1] vs 1.62 to [0,0]; sub1 2.0 vs 162.0
    assert(codes(2L) === Seq(1, 0))
    // id 3: sub0 exact 0 to [0,0] (a TIE with nothing); sub1 0 to [0,0]
    assert(codes(3L) === Seq(0, 1))
  }

  test("ADC top-k sums per-subspace table lookups, ascending distance") {
    val books = Ann.pqCodebook(corpus, "vec_id", "embedding", m = 2, k = 2)
    val got = Ann.pqTopK(corpus, corpus.filter(col("vec_id") === 3),
        "vec_id", "embedding", k = 3, books)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // query [0,0,0,0]: dt = [[0,2],[200,0]] → id1: 2+0=2, id0: 0+200=200,
    // id2: 2+200=202
    assert(got.toSeq === Seq(
      (3L, 1, 1L, 2.0), (3L, 2, 0L, 200.0), (3L, 3, 2L, 202.0)))
  }

  test("Lloyd refinement converges sub-codebooks to cluster means") {
    // 1-dim subspaces, k=2: seeds [0],[0.2] mis-split {0, 0.2, 10, 10.2};
    // two iterations settle on the true cluster means 0.1 and 10.1
    val pts = Seq((0L, Array(0f, 0f)), (1L, Array(0.2f, 0.2f)),
      (2L, Array(10f, 10f)), (3L, Array(10.2f, 10.2f)))
      .toDF("vec_id", "embedding")
    val books = Ann.pqCodebookLloyd(pts, "vec_id", "embedding",
      m = 2, k = 2, iters = 2)
    for (s <- 0 until 2) {
      assert(math.abs(books(s)(0)(0) - 0.1f) < 1e-5f, books(s)(0).toSeq)
      assert(math.abs(books(s)(1)(0) - 10.1f) < 1e-5f, books(s)(1).toSeq)
    }
  }

  test("exact L2 top-k ranks by squared distance, ascending") {
    val got = Ann.l2TopK(corpus, corpus.filter(col("vec_id") === 3),
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // query [0,0,0,0]: id1 ‖·‖²=2, id2 ≈163.62 (0.9f widens inexactly),
    // id0 200 — sequential ssq accumulation replayed on the same floats
    val p = 0.9f.toDouble * 0.9f.toDouble
    val id2 = ((p + p) + 81.0) + 81.0
    assert(got.toSeq === Seq((1, 1L, 2.0), (2, 2L, id2), (3, 0L, 200.0)))
  }

  test("equal codes give equal ADC distance; ties rank the smaller id first") {
    val dup = corpus.union(Seq((4L, Array(1.1f, 1.1f, 0.4f, 0.4f)))
      .toDF("vec_id", "embedding")) // encodes to (1, 1), same as id 1
    val books = Ann.pqCodebook(dup, "vec_id", "embedding", m = 2, k = 2)
    val got = Ann.pqTopK(dup, dup.filter(col("vec_id") === 3),
        "vec_id", "embedding", k = 2, books)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1, 1L, 2.0), (2, 4L, 2.0)))
  }
}
