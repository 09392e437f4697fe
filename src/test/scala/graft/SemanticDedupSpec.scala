package graft

import graft.operators.Ann

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("semanticDedup: seed assignment, within-cluster drop, cross-cluster immunity") {
    // seeds 0=(1,0) and 1=(0,1); 2 is near seed 0 but below threshold,
    // 3 near seed 1, 4 collinear with 0 (cos = 1) -> dropped.
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.99f, 0.14f)), (3L, Array(0.14f, 0.99f)),
      (4L, Array(2f, 0f))).toDF("vec_id", "embedding")
    val got = Ann.semanticDedup(vecs, "vec_id", "embedding",
        numSeeds = 2, threshold = 0.999)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(0L) === ((0L, true)))
    assert(got(1L) === ((1L, true)))
    assert(got(2L) === ((0L, true)))  // similar but under threshold
    assert(got(3L) === ((1L, true)))
    assert(got(4L) === ((0L, false))) // exact-direction dup of id 0
  }

  test("semanticDedupBanded matches the exact within-cluster operator") {
    // 40 deterministic 8-dim vectors + a scaled copy of every 4th
    // (cosine exactly 1 to its original) — the banded scale path must
    // produce the identical verdict frame as the exact quadratic.
    val base = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => (((i * 97 + d * 13) % 101) - 50).toFloat / 25f))
    }
    val planted = base.filter(_._1 % 4 == 0)
      .map { case (i, v) => (i + 1000L, v.map(_ * 2f)) }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val exact = Ann.semanticDedup(corpus, "vec_id", "embedding", 4, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val banded = Ann.semanticDedupBanded(corpus, "vec_id", "embedding", 4, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(banded === exact)
    // every planted copy drops (naturals may too if genuinely near-dup;
    // both paths must agree on those, which the frame equality pins)
    val droppedIds = exact.collect { case (id, _, false) => id }
    assert(planted.map(_._1).toSet.subsetOf(droppedIds))
  }

  test("semanticDedup tolerates an empty seed set and duplicate corpus ids") {
    // no id < numSeeds -> zero seeds: the assignment degrades to a
    // null cluster (the old crossJoin+top-1 behavior), never a crash
    val noSeeds = Seq((10L, Array(1f, 0f)), (11L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Ann.semanticDedup(noSeeds, "vec_id", "embedding", 2, 0.999)
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.getBoolean(2))).toSet
    assert(got === Set((10L, true, true), (11L, true, true)))

    // duplicate seed-range ids must not violate SeedArgmax's
    // strictly-ascending precondition (dedupe before construction)
    val dupIds = Seq(
      (0L, Array(1f, 0f)), (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(4f, 0f))).toDF("vec_id", "embedding")
    val byId = Ann.semanticDedup(dupIds, "vec_id", "embedding", 2, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byId.contains((2L, 0L))) // assigned to seed 0, no crash

    // ...and the duplicate KEPT must not depend on collect() partition
    // order: of conflicting vectors the lexicographically smallest
    // wins. Here id 0 carries [1,0] and [0,1] -> [0,1] is kept, so the
    // probe vector [1,0] scores 0 against seed 0 and 1 against seed 1:
    // cluster must be 1 every run (keeping [1,0] instead would tie at
    // 1.0 and resolve to the smaller id 0 — a different, order-
    // dependent answer)
    val dupVecs = Seq(
      (0L, Array(1f, 0f)), (0L, Array(0f, 1f)), (1L, Array(1f, 0f)),
      (10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val probe = Ann.semanticDedup(dupVecs, "vec_id", "embedding", 2, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(probe(10L) === 1L)
  }

  test("semanticDedup: the drop rule is 'any earlier item', ids beyond seeds keep clusters") {
    // three collinear vectors in one cluster: 2 and 3 both drop against 0
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(3f, 0f)), (3L, Array(5f, 0f))).toDF("vec_id", "embedding")
    val keep = Ann.semanticDedup(vecs, "vec_id", "embedding", 2, 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep === Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
  }
}
