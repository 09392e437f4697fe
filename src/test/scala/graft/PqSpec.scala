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

  test("IVF-PQ ADC distance equals the residual-reconstruction distance") {
    // independent recomputation: for every reported (query, neighbor),
    // rebuild the neighbor's quantized form centroid+decode(codes) on
    // the driver and check the ADC score is ‖(q − c) − decode‖² — a
    // different association order, so compare within 1e-9
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 3)
    val cents = Ann.ivfCentroids(e, "vec_id", "embedding", nlist = 8,
      lloydIters = 0)
    val got = Ann.ivfPqTopK(e, q, "vec_id", "embedding", k = 5)
      .collect()
    assert(got.length === 15, "3 queries × k=5")
    val vecs = e.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // replicate the seeded residual codebooks and assignments locally
    def cellOf(v: Array[Float]): Int = {
      val unit = cents.map { c =>
        val n = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
        c.map(_.toDouble / (if (n == 0) 1.0 else n))
      }
      val scores = unit.map(u => u.zip(v).map { case (a, b) => a * b.toDouble }.sum)
      scores.zipWithIndex.maxBy { case (s, i) => (s, i) }._2
    }
    def residOf(v: Array[Float]): Array[Float] = {
      val c = cents(cellOf(v))
      v.zip(c).map { case (a, b) => a - b }
    }
    val sub = 16
    val books = Array.tabulate(4)(s =>
      (0L until 16L).map(j => residOf(vecs(j)).slice(s * sub, s * sub + sub)).toArray)
    def codesOf(r: Array[Float]): Array[Int] = Array.tabulate(4) { s =>
      val rs = r.slice(s * sub, s * sub + sub)
      books(s).zipWithIndex.minBy { case (b, j) =>
        (b.zip(rs).map { case (x, y) => val d = y.toDouble - x.toDouble; d * d }.sum, j)
      }._2
    }
    got.foreach { r =>
      val qid = r.getLong(0); val nid = r.getLong(2); val adc = r.getDouble(3)
      val nb = vecs(nid)
      val cell = cellOf(nb)
      val qr = vecs(qid).zip(cents(cell)).map { case (a, b) => a - b }
      val codes = codesOf(residOf(nb))
      val recon = (0 until 4).flatMap(s => books(s)(codes(s))).toArray
      val expect = qr.zip(recon).map { case (a, b) =>
        val d = a.toDouble - b.toDouble; d * d }.sum
      assert(math.abs(adc - expect) < 1e-9,
        s"query $qid neighbor $nid: adc=$adc recon=$expect")
    }
  }

  test("IVF-PQ rerank reports exact L2 distances in ascending order") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 3)
    val vecs = e.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = Ann.ivfPqRerankTopK(e, q, "vec_id", "embedding",
      k = 5, shortlist = 20).collect()
    assert(got.length === 15)
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val ds = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(ds.sorted.toSeq === ds.toSeq, s"query $qid not ascending")
      rows.foreach { r =>
        val qv = vecs(qid); val cv = vecs(r.getLong(2))
        val exact = qv.zip(cv).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d }.sum
        assert(math.abs(r.getDouble(3) - exact) < 1e-6,
          s"query $qid neighbor ${r.getLong(2)}")
      }
    }
  }

  test("build-once index serves every operating point like the monolithic call") {
    // ivfPqBuild + ivfPqServeRerank at (nprobe, shortlist) must equal
    // ivfPqRerankTopK trained with identical knobs — the serve split
    // exists so sweeping the operating curve never retrains
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 3)
    val idx = Ann.ivfPqBuild(e, "vec_id", "embedding",
      nlist = 8, m = 4, codebookK = 16, lloydIters = 1)
    for ((nprobe, shortlist) <- Seq((1, 10), (2, 20), (4, 20))) {
      def key(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(t => (t._1, t._2))
      val split = key(Ann.ivfPqServeRerank(idx, e, q, "vec_id", "embedding",
        k = 5, shortlist = shortlist, nprobe = nprobe).collect())
      val mono = key(Ann.ivfPqRerankTopK(e, q, "vec_id", "embedding",
        k = 5, shortlist = shortlist, nlist = 8, nprobe = nprobe,
        m = 4, codebookK = 16, lloydIters = 1).collect())
      assert(split.toSeq === mono.toSeq, s"nprobe=$nprobe shortlist=$shortlist")
    }
  }

  test("saved cell-partitioned index serves identically WITH partition pruning") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 3)
    val idx = Ann.ivfPqBuild(e, "vec_id", "embedding",
      nlist = 8, m = 4, codebookK = 16, lloydIters = 1)
    val dir = graft.util.Scratch.dir("pq_index").resolve("idx").toString
    Ann.ivfPqSaveIndex(idx, dir)
    val loaded = Ann.ivfPqLoadIndex(spark, dir)
    assert(loaded.cents.map(_.toSeq).toSeq === idx.cents.map(_.toSeq).toSeq)
    assert(loaded.books.map(_.map(_.toSeq).toSeq).toSeq ===
      idx.books.map(_.map(_.toSeq).toSeq).toSeq)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val servedDisk = Ann.ivfPqServeRerank(loaded, e, q, "vec_id",
      "embedding", k = 5, shortlist = 20, nprobe = 2)
    assert(key(servedDisk.collect()) ===
      key(Ann.ivfPqServeRerank(idx, e, q, "vec_id", "embedding",
        k = 5, shortlist = 20, nprobe = 2).collect()))
    // the probed-cell isin filter must reach the partitioned scan as a
    // PartitionFilter — the 100 TB serving read path opens only the
    // probed cell directories, never the whole index
    val adc = Ann.ivfPqServeTopK(loaded, q, "vec_id", "embedding",
      k = 5, nprobe = 2)
    val plan = adc.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected cell partition pruning in:\n${plan.take(2000)}")
  }

  test("IVF-PQ only scores neighbors whose cell the query probes") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 3)
    val cents = Ann.ivfCentroids(e, "vec_id", "embedding", nlist = 8,
      lloydIters = 0)
    val cellCol = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.CentroidCells(Seq(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("embedding"))),
        cents, 8))
    val assign = e.select(col("vec_id").cast("long").as("id"),
        element_at(cellCol, 1).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probes = q.select(col("vec_id").cast("long").as("id"),
        slice(cellCol, 1, 2).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    Ann.ivfPqTopK(e, q, "vec_id", "embedding", k = 5).collect().foreach { r =>
      assert(probes(r.getLong(0)).contains(assign(r.getLong(2))),
        s"neighbor ${r.getLong(2)} not in query ${r.getLong(0)}'s probed cells")
    }
  }
}
