package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** Similarity-search coverage over the `embeddings` table. */
object AnnQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Per-vector L2 norm + dimensionality (exercise of the array math the
    * ANN path is built on). */
  val qEmbedNorms: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    e.select(col("vec_id"), size(col("embedding")).as("dim"),
      round(Ann.norm(col("embedding")), 6).as("l2_norm"), col("label"))
      .orderBy("vec_id")
  }

  val qEmbedNormsSql: String =
    """SELECT vec_id, len(embedding) AS dim,
      |  round(sqrt(list_sum(list_transform(embedding,
      |    x -> cast(x as double) * cast(x as double)))), 6) AS l2_norm,
      |  label
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Brute-force cosine top-5 for query vectors vec_id < 3. */
  val qAnnBruteForce: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    Ann.bruteForceTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  val qAnnBruteForceSql: String =
    """WITH v AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> cast(x as double)*cast(x as double)))) AS nrm
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, len(q.embedding) + 1),
      |      i -> cast(q.embedding[i] as double) * cast(c.embedding[i] as double)))
      |      / (q.nrm * c.nrm) AS cos_sim
      |  FROM v q, v c WHERE q.vec_id < 3 AND c.vec_id != q.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, neighbor_id, round(cos_sim, 6) AS cos_sim
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed ANN. The bucketing is murmur3-derived, so the oracle
    * cannot re-derive WHICH neighbors LSH returns (recall < 1 by
    * construction) — instead the query emits per-query INVARIANTS the
    * oracle asserts: exactly k results, ranks are a 1..k permutation,
    * and every reported score equals the exact cosine recomputed
    * independently from the embeddings (to 1e-12). */
  val qAnnLsh: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    val topk = Ann.lshTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
    val qv = e.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cv = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    topk.join(broadcast(qv), "query_id").join(cv, "neighbor_id")
      .withColumn("exact", Ann.cosine(col("qv"), col("cv")))
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_rows"),
        (min((abs(col("cos_sim") - col("exact")) < 1e-12).cast("int")) === 1)
          .as("scores_exact"),
        (min("rank") === 1 && max("rank") === 5 &&
          countDistinct("rank") === 5).as("ranks_ok"))
      .orderBy("query_id")
  }

  val qAnnLshSql: String =
    """SELECT vec_id AS query_id, cast(5 as bigint) AS n_rows,
      |  true AS scores_exact, true AS ranks_ok
      |FROM embeddings WHERE vec_id < 3 ORDER BY 1""".stripMargin

  /** IVF ANN — same invariant-oracle scheme as [[qAnnLsh]] (the probed
    * candidate set is data-dependent, the well-formedness and exactness
    * of reported scores are not). */
  val qAnnIvf: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    val topk = Ann.ivfTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
    val qv = e.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cv = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    topk.join(broadcast(qv), "query_id").join(cv, "neighbor_id")
      .withColumn("exact", Ann.cosine(col("qv"), col("cv")))
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_rows"),
        (min((abs(col("cos_sim") - col("exact")) < 1e-12).cast("int")) === 1)
          .as("scores_exact"),
        (min("rank") === 1 && max("rank") === 5 &&
          countDistinct("rank") === 5).as("ranks_ok"))
      .orderBy("query_id")
  }

  val qAnnIvfSql: String =
    """SELECT vec_id AS query_id, cast(5 as bigint) AS n_rows,
      |  true AS scores_exact, true AS ranks_ok
      |FROM embeddings WHERE vec_id < 3 ORDER BY 1""".stripMargin

  /** Recall@10 of BOTH approximate paths against the exact top-k,
    * as a driver-gated value (VERDICT r5 #7: ScaleBench asserts
    * recall ≥ 0.9 at 1M, but the correctness gate never saw it).
    * Every input is deterministic — murmur3 sign-planes for LSH,
    * stride-seeded + fixed-point-Lloyd centroids for IVF, exact-cosine
    * scoring with smaller-id tie-breaks — so the oracle (see
    * [[annRecallSql]]) replays BOTH pipelines end-to-end from the
    * corpus actually read: any drift in bucketing, probing, or ranking
    * changes a hit count and fails the gate, at ANY scale factor.
    * (Absolute recall is LOW here by nature: the test embeddings are
    * isotropic random vectors, the worst case for any sublinear ANN.
    * The ≥0.9 recall INVARIANT lives in ScaleBench stage 6, on 1M
    * clustered vectors — the data shape IVF exists for. This entry is
    * the drift alarm, not the quality bar.) */
  val qAnnRecall: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    // the SQL oracle interpolates the hyperplane/codebook machinery for
    // dims = 64 specifically; a corpus of any other width would make
    // DuckDB NULL-pad its plane weights out of bounds and fail with a
    // baffling hit-count mismatch — fail HERE with the real reason
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    require(dims == 64,
      s"ann_recall's DuckDB oracle replays 64-dim LSH/IVF machinery; " +
        s"embeddings are $dims-dim — regenerate the oracle constants")
    val q = e.filter(col("vec_id") < 20)
    val k = 10
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    def hits(approx: DataFrame, name: String): DataFrame =
      approx.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as(name))
    q.select(col("vec_id").as("query_id"))
      .join(hits(Ann.lshTopK(e, q, "vec_id", "embedding", k), "lsh_hits"),
        Seq("query_id"), "left")
      .join(hits(Ann.ivfTopK(e, q, "vec_id", "embedding", k), "ivf_hits"),
        Seq("query_id"), "left")
      .na.fill(0L, Seq("lsh_hits", "ivf_hits"))
      .orderBy("query_id")
  }

  /** The ±1 hyperplane sign matrix [[Ann.lshBucket]] hashes with —
    * w(p,d) = low bit of murmur3(d, murmur3(p, seed)) — as a DuckDB
    * VALUES literal. The weights are ALGORITHM constants (they depend
    * only on (plane, dim, seed), never on data), generated here from
    * the very `Murmur3_x86_32.hashInt` the engine kernel calls, so the
    * oracle's plane family cannot drift from the engine's. */
  private def lshPlanesLiteral(planes: Int, dims: Int, seed: Int): String = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt
    (0 until planes).map { p =>
      val seedP = hashInt(p, seed)
      val ws = (0 until dims).map(d =>
        if ((hashInt(d, seedP) & 1) == 1) "1.0" else "-1.0").mkString(", ")
      s"($p, [$ws])"
    }.mkString(",\n  ")
  }

  /** Full SQL replay of [[qAnnRecall]] — NO data-dependent pins.
    * Exact ground truth is brute-force cosine top-k; the LSH side
    * recomputes every vector's sign bucket from the interpolated plane
    * matrix ([[lshPlanesLiteral]]) plus the single-bit multi-probe; the
    * IVF side replays stride-seeded init → one fixed-point Lloyd step
    * (`floor(x·2^24 + 0.5)` is exactly Java's `Math.round`) → refined
    * cell assignment → 4-cell probe. All dot products are sequential
    * double accumulation (`list_sum(list_transform(...))`), the same
    * order the compiled kernels use, so hit counts match at any SF. */
  private def annRecallSql(planes: Int = 8, dims: Int = 64,
      seed: Int = 42): String =
    s"""WITH planes(p, w) AS (VALUES
      |  ${lshPlanesLiteral(planes, dims, seed)}),
      |v AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> cast(x as double) * cast(x as double)))) AS nrm
      |  FROM embeddings),
      |ex AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, len(q.embedding) + 1),
      |      i -> cast(q.embedding[i] as double) * cast(c.embedding[i] as double)))
      |      / (q.nrm * c.nrm) AS cs
      |  FROM v q, v c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
      |exact AS (SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rn
      |    FROM ex) WHERE rn <= 10),
      |pb AS (
      |  SELECT e.vec_id, pl.p,
      |    list_sum(list_transform(range(1, len(e.embedding) + 1),
      |      i -> cast(e.embedding[i] as double) * pl.w[i])) AS acc
      |  FROM embeddings e, planes pl),
      |bk AS (
      |  SELECT vec_id,
      |    cast(sum(CASE WHEN acc > 0 THEN 1 << p ELSE 0 END) as int) AS bucket
      |  FROM pb GROUP BY 1),
      |probes AS (
      |  SELECT vec_id AS query_id, bucket AS pr FROM bk WHERE vec_id < 20
      |  UNION
      |  SELECT b.vec_id, xor(b.bucket, 1 << cast(t.p as int))
      |  FROM bk b, unnest(range(0, $planes)) t(p) WHERE b.vec_id < 20),
      |lsh_scored AS (
      |  SELECT pr.query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, len(q.embedding) + 1),
      |      i -> cast(q.embedding[i] as double) * cast(c.embedding[i] as double)))
      |      / (q.nrm * c.nrm) AS cs
      |  FROM probes pr
      |  JOIN bk cb ON cb.bucket = pr.pr
      |  JOIN v c ON c.vec_id = cb.vec_id
      |  JOIN v q ON q.vec_id = pr.query_id
      |  WHERE cb.vec_id <> pr.query_id),
      |lsh_top AS (SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rn
      |    FROM lsh_scored) WHERE rn <= 10),
      |lh AS (SELECT a.query_id, count(*) AS c
      |  FROM lsh_top a JOIN exact x USING (query_id, neighbor_id) GROUP BY 1),
      |n AS (SELECT count(*) AS cnt FROM embeddings),
      |seeds AS (SELECT cell, c0 FROM (
      |    SELECT row_number() OVER (ORDER BY e.vec_id) - 1 AS cell,
      |      e.embedding AS c0
      |    FROM embeddings e, n
      |    WHERE e.vec_id % greatest(n.cnt // 16, 1) = 0)
      |  WHERE cell < 16),
      |s0 AS (SELECT cell, c0,
      |    sqrt(list_sum(list_transform(c0,
      |      y -> cast(y as double) * cast(y as double)))) AS nm
      |  FROM seeds),
      |unit0 AS (SELECT cell, list_transform(c0,
      |    x -> cast(x as double) / (CASE WHEN nm = 0 THEN 1.0 ELSE nm END)) AS u
      |  FROM s0),
      |a0s AS (
      |  SELECT e.vec_id, u0.cell,
      |    list_sum(list_transform(range(1, len(e.embedding) + 1),
      |      i -> cast(e.embedding[i] as double) * u0.u[i])) AS sc
      |  FROM embeddings e, unit0 u0),
      |asg0 AS (SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY sc DESC, cell DESC) AS rn
      |    FROM a0s) WHERE rn = 1),
      |fp AS (
      |  SELECT a.cell, t.i - 1 AS dim,
      |    cast(floor(cast(e.embedding[t.i] as double) * 16777216.0 + 0.5)
      |      as bigint) AS uq
      |  FROM embeddings e JOIN asg0 a USING (vec_id),
      |    unnest(range(1, ${dims + 1})) AS t(i)),
      |upd AS (SELECT cell, dim, sum(uq) AS s, count(*) AS c
      |  FROM fp GROUP BY 1, 2),
      |c1 AS (SELECT cell,
      |    list(cast(cast(s as double) / c / 16777216.0 as real) ORDER BY dim) AS cv
      |  FROM upd GROUP BY cell),
      |cents AS (SELECT s0.cell, coalesce(c1.cv, s0.c0) AS cv
      |  FROM s0 LEFT JOIN c1 USING (cell)),
      |cn AS (SELECT cell, cv,
      |    sqrt(list_sum(list_transform(cv,
      |      y -> cast(y as double) * cast(y as double)))) AS nm
      |  FROM cents),
      |unit1 AS (SELECT cell, list_transform(cv,
      |    x -> cast(x as double) / (CASE WHEN nm = 0 THEN 1.0 ELSE nm END)) AS u
      |  FROM cn),
      |a1s AS (
      |  SELECT e.vec_id, u1.cell,
      |    list_sum(list_transform(range(1, len(e.embedding) + 1),
      |      i -> cast(e.embedding[i] as double) * u1.u[i])) AS sc
      |  FROM embeddings e, unit1 u1),
      |cellof AS (SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY sc DESC, cell DESC) AS rn
      |    FROM a1s) WHERE rn = 1),
      |qprobe AS (SELECT query_id, cell FROM (
      |    SELECT vec_id AS query_id, cell, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY sc DESC, cell DESC) AS rn
      |    FROM a1s WHERE vec_id < 20) WHERE rn <= 4),
      |ivf_scored AS (
      |  SELECT qp.query_id, co.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, len(q.embedding) + 1),
      |      i -> cast(q.embedding[i] as double) * cast(c.embedding[i] as double)))
      |      / (q.nrm * c.nrm) AS cs
      |  FROM qprobe qp
      |  JOIN cellof co USING (cell)
      |  JOIN v c ON c.vec_id = co.vec_id
      |  JOIN v q ON q.vec_id = qp.query_id
      |  WHERE co.vec_id <> qp.query_id),
      |ivf_top AS (SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rn
      |    FROM ivf_scored) WHERE rn <= 10),
      |ih AS (SELECT a.query_id, count(*) AS c
      |  FROM ivf_top a JOIN exact x USING (query_id, neighbor_id) GROUP BY 1)
      |SELECT e.vec_id AS query_id,
      |  cast(coalesce(lh.c, 0) as bigint) AS lsh_hits,
      |  cast(coalesce(ih.c, 0) as bigint) AS ivf_hits
      |FROM embeddings e
      |LEFT JOIN lh ON e.vec_id = lh.query_id
      |LEFT JOIN ih ON e.vec_id = ih.query_id
      |WHERE e.vec_id < 20 ORDER BY query_id""".stripMargin

  val qAnnRecallSql: String = annRecallSql()

  /** Embedding-cosine near-dup dedup — the dedup-by-embedding mode of a
    * training-data pipeline. The corpus has no natural near-dups (max
    * pairwise cosine 0.513 at sf0.01), so one near-dup per vector is
    * PLANTED: odd components scaled ×1.2 in double then narrowed back to
    * float (bit-identical construction in both engines), giving cosine
    * ≈ 0.996 to the original vs ≤ 0.52 to everything else. The
    * banded-LSH + exact-refine pipeline must find exactly those planted
    * pairs with exact scores (miss probability ≈ 1e-13/pair). */
  val qDedupEmbedding: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    val pert = e.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i % 2 === 1, (x.cast("double") * lit(1.2)).cast("float"))
          .otherwise(x)).as("embedding"))
    val aug = e.select(col("vec_id"), col("embedding")).union(pert)
    Ann.cosineNearDups(aug, "vec_id", "embedding", 0.97)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy("id_a", "id_b")
  }

  /** Semantic dedup (Ann.semanticDedup — the SemDeDup cluster-then-
    * refine shape): nearest-of-8-seed-centroids assignment, then the
    * within-cluster "similar to any earlier item ≥ 0.95" drop rule,
    * over the corpus plus its perturbed copies (the [[qDedupEmbedding]]
    * augmentation, so real near-dups exist). Assignment AND refine are
    * replayed by the oracle — the full pipeline hashes, not just the
    * pair list. */
  val qDedupSemantic: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    val pert = e.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i % 2 === 1, (x.cast("double") * lit(1.2)).cast("float"))
          .otherwise(x)).as("embedding"))
    val aug = e.select(col("vec_id"), col("embedding")).union(pert)
    Ann.semanticDedup(aug, "vec_id", "embedding", numSeeds = 8, threshold = 0.95)
      .select(col("id").as("vec_id"), col("cluster"), col("keep"))
      .orderBy("vec_id")
  }

  val qDedupSemanticSql: String =
    """WITH aug AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    list_transform(range(1, len(embedding) + 1),
      |      i -> CASE WHEN i % 2 = 0
      |        THEN cast(cast(embedding[i] as double) * 1.2 as real)
      |        ELSE embedding[i] END)
      |  FROM embeddings),
      |v AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> cast(x as double) * cast(x as double)))) AS nrm
      |  FROM aug),
      |s AS (SELECT vec_id AS sid, embedding AS sv, nrm AS snrm
      |  FROM v WHERE vec_id < 8),
      |sim AS (
      |  SELECT v.vec_id, s.sid,
      |    list_sum(list_transform(range(1, len(v.embedding) + 1),
      |      i -> cast(v.embedding[i] as double) * cast(s.sv[i] as double)))
      |      / (v.nrm * s.snrm) AS c
      |  FROM v, s),
      |asg AS (SELECT vec_id, sid AS cluster FROM (
      |    SELECT vec_id, sid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, sid) AS rn
      |    FROM sim) WHERE rn = 1),
      |m AS (SELECT v.vec_id, v.embedding, v.nrm, asg.cluster
      |  FROM v JOIN asg USING (vec_id)),
      |p AS (SELECT DISTINCT b.vec_id AS id
      |  FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      |  WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> cast(a.embedding[i] as double) * cast(b.embedding[i] as double)))
      |      / (a.nrm * b.nrm) >= 0.95)
      |SELECT vec_id, cluster, vec_id NOT IN (SELECT id FROM p) AS keep
      |FROM m ORDER BY vec_id""".stripMargin

  val qDedupEmbeddingSql: String =
    """WITH aug AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    list_transform(range(1, len(embedding) + 1),
      |      i -> CASE WHEN i % 2 = 0
      |        THEN cast(cast(embedding[i] as double) * 1.2 as real)
      |        ELSE embedding[i] END)
      |  FROM embeddings),
      |v AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> cast(x as double) * cast(x as double)))) AS nrm
      |  FROM aug),
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> cast(a.embedding[i] as double) * cast(b.embedding[i] as double)))
      |      / (a.nrm * b.nrm) AS c
      |  FROM v a, v b WHERE a.vec_id < b.vec_id)
      |SELECT id_a, id_b, round(c, 6) AS cos_sim FROM p
      |WHERE c >= 0.97 ORDER BY 1, 2""".stripMargin

  /** Per-label embedding centroids — the array-aggregation pattern of
    * an IVF/k-means training step: explode dimensions, fixed-point
    * partial sums per (label, dim) — map-side combined, so the shuffle
    * carries labels × dims longs, never vectors — and one exact final
    * division. */
  val qEmbedCentroids: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    e.select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").as("dim"),
        round(col("col").cast("double") * 1048576).cast("long").as("u"))
      .groupBy("label", "dim")
      .agg(sum("u").as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        (col("s").cast("double") / (col("n") * lit(1048576.0))).as("centroid"))
      .orderBy("label", "dim")
  }

  val qEmbedCentroidsSql: String =
    """SELECT label, i - 1 AS dim,
      |  cast(sum(cast(round(cast(embedding[i] as double)*1048576) as bigint)) as double)
      |    / (count(*) * 1048576.0) AS centroid
      |FROM embeddings, unnest(range(1, 65)) AS t(i)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Scalar-quantization (SQ8) codes — the embedding-compression
    * baseline a 100 TB vector store actually persists (4 bytes/dim →
    * 1 byte/dim): per-dimension min/max bounds from ONE map-side-partial
    * aggregation (64 rows out), broadcast back, then pure arithmetic
    * codes + reconstruction error per (vector, dim). Float→double casts
    * are exact and every step is a single correctly-rounded double op
    * mirrored in the oracle, so codes and errors hash-match. */
  val qEmbedSqCodes: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    val dims = e.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        col("col").cast("double").as("x"))
    val bounds = dims.groupBy("dim")
      .agg(min("x").as("mn"), max("x").as("mx"))
    dims.join(broadcast(bounds), Seq("dim"))
      .withColumn("code", when(col("mx") === col("mn"), lit(0L))
        .otherwise(round((col("x") - col("mn")) / (col("mx") - col("mn")) * 255)
          .cast("long")))
      .withColumn("recon",
        col("mn") + col("code") / 255.0 * (col("mx") - col("mn")))
      .select(col("vec_id"), col("dim"), col("code"),
        round(abs(col("x") - col("recon")) * 1000000).cast("long")
          .as("err_micro"))
      .orderBy("vec_id", "dim")
  }

  val qEmbedSqCodesSql: String =
    """WITH d AS (
      |  SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS x
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
      |b AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM d GROUP BY 1),
      |c AS (
      |  SELECT vec_id, d.dim, x, mn, mx,
      |    CASE WHEN mx = mn THEN cast(0 as bigint)
      |         ELSE cast(round(((x - mn) / (mx - mn)) * 255) as bigint)
      |    END AS code
      |  FROM d JOIN b ON d.dim = b.dim)
      |SELECT vec_id, cast(dim as bigint) AS dim, code,
      |  cast(round(abs(x - (mn + ((code / 255.0) * (mx - mn)))) * 1000000)
      |    as bigint) AS err_micro
      |FROM c ORDER BY vec_id, dim""".stripMargin

  /** Exact PCA moment matrix ([[graft.operators.Pca.covLongForm]] over
    * the [[graft.expressions.GramAggregate]]): ONE fused pass reduces
    * the corpus to d(d+1)/2 + d + 1 integer sums (micros-quantized) —
    * the inputs of the driver-side Jacobi PCA fit, emitted in long
    * form so the oracle can replay every integer. The naive shape
    * (posexplode × posexplode self-join) ships d² rows per vector;
    * the aggregate ships one 17 KB buffer per map task. The eigen /
    * projection half is driver-sized (d=64) and spec-verified
    * (PcaSpec); this entry pins the distributed half bit-for-bit. */
  val qEmbedPcaCov: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    graft.operators.Pca.covLongForm(e, "embedding", d = 64, scale = 1000000L)
      .orderBy("dim_i", "dim_j")
  }

  val qEmbedPcaCovSql: String =
    """WITH idx AS (SELECT unnest(generate_series(1,64)) AS i),
      |x AS (SELECT e.vec_id, i.i AS i,
      |        cast(round(cast(e.embedding[i.i] as double)*1000000) as bigint) AS xq
      |      FROM embeddings e, idx i),
      |s AS (SELECT a.i-1 AS dim_i, b.i-1 AS dim_j,
      |        cast(sum(a.xq*b.xq) as bigint) AS s_ij
      |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
      |      GROUP BY 1,2),
      |m AS (SELECT i-1 AS dim, cast(sum(xq) as bigint) AS sm, count(*) AS n
      |      FROM x GROUP BY 1)
      |SELECT cast(s.dim_i as bigint) AS dim_i, cast(s.dim_j as bigint) AS dim_j,
      |  s.s_ij, mi.sm AS sum_i, mj.sm AS sum_j, mi.n AS n
      |FROM s JOIN m mi ON s.dim_i = mi.dim JOIN m mj ON s.dim_j = mj.dim
      |ORDER BY dim_i, dim_j""".stripMargin

  /** Product-quantization codes — the compression step beyond SQ8
    * ([[qEmbedSqCodes]]): 64 floats → 4 codebook indices (one per
    * 16-dim subspace, 16-entry seeded codebooks). Encode is one
    * map-side compiled pass; the oracle replays codebook construction
    * AND the argmin (sequential squared-diff accumulation, ties to the
    * smaller code) end-to-end in SQL. */
  val qEmbedPqCodes: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    val books = Ann.pqCodebook(e, "vec_id", "embedding", m = 4, k = 16)
    Ann.pqEncode(e, "vec_id", "embedding", books)
      .select(col("id").as("vec_id"), posexplode(col("codes")))
      .select(col("vec_id"), col("pos").cast("long").as("sub"),
        col("col").cast("long").as("code"))
      .orderBy("vec_id", "sub")
  }

  val qEmbedPqCodesSql: String =
    """WITH cb AS (SELECT vec_id AS j, embedding AS cv FROM embeddings
      |  WHERE vec_id < 16),
      |sub AS (SELECT unnest(range(0, 4)) AS m),
      |d AS (
      |  SELECT e.vec_id, sub.m, cb.j,
      |    list_sum(list_transform(range(1, 17), i ->
      |      (cast(e.embedding[sub.m*16 + i] as double) -
      |       cast(cb.cv[sub.m*16 + i] as double)) *
      |      (cast(e.embedding[sub.m*16 + i] as double) -
      |       cast(cb.cv[sub.m*16 + i] as double)))) AS dist
      |  FROM embeddings e, sub, cb),
      |r AS (SELECT vec_id, m, j,
      |    row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, j) AS rn
      |  FROM d)
      |SELECT vec_id, m AS sub, j AS code FROM r WHERE rn = 1
      |ORDER BY vec_id, sub""".stripMargin

  /** ADC top-5 over PQ codes for queries vec_id < 3 — the
    * compressed-domain scan: corpus rows are scored from 4 codes via
    * table lookups, never touching corpus vectors. Reported distances
    * are bit-exact functions of (codes, query dist table), so the
    * oracle replays encode + table + gather-sum and the full ranking
    * hashes. */
  val qAnnPq: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    val books = Ann.pqCodebook(e, "vec_id", "embedding", m = 4, k = 16)
    Ann.pqTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5, books)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adc_dist"), 6).as("adc_dist"))
      .orderBy("query_id", "rank")
  }

  val qAnnPqSql: String =
    """WITH cb AS (SELECT vec_id AS j, embedding AS cv FROM embeddings
      |  WHERE vec_id < 16),
      |sub AS (SELECT unnest(range(0, 4)) AS m),
      |d AS (
      |  SELECT e.vec_id, sub.m, cb.j,
      |    list_sum(list_transform(range(1, 17), i ->
      |      (cast(e.embedding[sub.m*16 + i] as double) -
      |       cast(cb.cv[sub.m*16 + i] as double)) *
      |      (cast(e.embedding[sub.m*16 + i] as double) -
      |       cast(cb.cv[sub.m*16 + i] as double)))) AS dist
      |  FROM embeddings e, sub, cb),
      |codes AS (SELECT vec_id, m, j AS code FROM (
      |    SELECT vec_id, m, j,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, j) AS rn
      |    FROM d) WHERE rn = 1),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_sum(list(q.dist ORDER BY q.m)) AS dist
      |  FROM d q JOIN codes c ON q.m = c.m AND q.j = c.code
      |  WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
      |  GROUP BY 1, 2),
      |ranked AS (SELECT query_id, neighbor_id, dist,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY dist, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, neighbor_id, round(dist, 6) AS adc_dist
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** PQ recall@10 as a CHECKED invariant (the [[qAnnRecall]] pattern
    * applied to the compressed-domain scan): per query, how many of
    * the ADC top-10 are in the EXACT squared-L2 top-10 — PQ
    * approximates L2, so L2 (not cosine) is the ground truth. The
    * oracle replays BOTH rankings end-to-end in SQL (codebook → codes
    * → ADC scores → rank, and the three-`list_sum` exact distance →
    * rank), so the recall numbers are pinned by construction at any
    * scale factor, not hand-pinned. */
  val qAnnPqRecall: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    // same oracle precondition as qAnnRecall: the SQL replays 64-dim
    // (4×16) codebook machinery — fail loudly on any other width
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    require(dims == 64,
      s"ann_pq_recall's DuckDB oracle replays 64-dim PQ machinery; " +
        s"embeddings are $dims-dim — regenerate the oracle constants")
    val q = e.filter(col("vec_id") < 20)
    val k = 10
    val books = Ann.pqCodebook(e, "vec_id", "embedding", m = 4, k = 16)
    val exact = Ann.l2TopK(e, q, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Ann.pqTopK(e, q, "vec_id", "embedding", k, books)
      .select(col("query_id"), col("neighbor_id"))
    q.select(col("vec_id").cast("long").as("query_id"))
      .join(approx.join(exact, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("pq_hits")),
        Seq("query_id"), "left")
      .na.fill(0L, Seq("pq_hits"))
      .orderBy("query_id")
  }

  val qAnnPqRecallSql: String =
    """WITH cb AS (SELECT vec_id AS j, embedding AS cv FROM embeddings
      |  WHERE vec_id < 16),
      |sub AS (SELECT unnest(range(0, 4)) AS m),
      |d AS (
      |  SELECT e.vec_id, sub.m, cb.j,
      |    list_sum(list_transform(range(1, 17), i ->
      |      (cast(e.embedding[sub.m*16 + i] as double) -
      |       cast(cb.cv[sub.m*16 + i] as double)) *
      |      (cast(e.embedding[sub.m*16 + i] as double) -
      |       cast(cb.cv[sub.m*16 + i] as double)))) AS dist
      |  FROM embeddings e, sub, cb),
      |codes AS (SELECT vec_id, m, j AS code FROM (
      |    SELECT vec_id, m, j,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, j) AS rn
      |    FROM d) WHERE rn = 1),
      |adc AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_sum(list(q.dist ORDER BY q.m)) AS dist
      |  FROM d q JOIN codes c ON q.m = c.m AND q.j = c.code
      |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
      |  GROUP BY 1, 2),
      |approx AS (SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |      PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
      |    FROM adc) WHERE rank <= 10),
      |ex AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    (list_sum(list_transform(range(1, 65), i ->
      |        cast(q.embedding[i] as double) * cast(q.embedding[i] as double))) +
      |     list_sum(list_transform(range(1, 65), i ->
      |        cast(c.embedding[i] as double) * cast(c.embedding[i] as double)))) -
      |    2 * list_sum(list_transform(range(1, 65), i ->
      |        cast(q.embedding[i] as double) * cast(c.embedding[i] as double)))
      |      AS l2
      |  FROM embeddings q, embeddings c
      |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
      |exact AS (SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (
      |      PARTITION BY query_id ORDER BY l2, neighbor_id) AS rank
      |    FROM ex) WHERE rank <= 10),
      |h AS (SELECT a.query_id, count(*) AS c
      |  FROM approx a JOIN exact x ON a.query_id = x.query_id
      |    AND a.neighbor_id = x.neighbor_id
      |  GROUP BY 1)
      |SELECT e.vec_id AS query_id, cast(coalesce(h.c, 0) as bigint) AS pq_hits
      |FROM embeddings e LEFT JOIN h ON e.vec_id = h.query_id
      |WHERE e.vec_id < 20 ORDER BY query_id""".stripMargin

  /** Composed IVF-PQ ([[Ann.ivfPqTopK]]) — the production serving shape:
    * IVF cell assignment, PQ codes of RESIDUALS, per-probe distance
    * tables, ADC scan of only the probed cells. With seeded models
    * (lloydIters=0 — stride centroids, first-16-residual codebooks)
    * every number is deterministic, and residual subtraction is
    * single-precision on both engines (Scala Float ≡ DuckDB REAL), so
    * the oracle replays the ENTIRE pipeline — coarse assignment, probe
    * selection, residual codebooks, codes, tables, gather-sum, ranking
    * — from the corpus actually read, and the full ranking hashes.
    * Lloyd-refined models plug into the identical plan (see
    * [[Ann.ivfCentroids]]/[[Ann.pqCodebookLloyd]]). */
  val qAnnIvfPq: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    require(dims == 64,
      s"ann_ivfpq_topk's DuckDB oracle replays 64-dim (8-cell, 4×16) " +
        s"IVF-PQ machinery; embeddings are $dims-dim — regenerate the " +
        "oracle constants")
    Ann.ivfPqTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adc_dist"), 6).as("adc_dist"))
      .orderBy("query_id", "rank")
  }

  val qAnnIvfPqSql: String =
    """WITH nn AS (SELECT count(*) AS n FROM embeddings),
      |cents AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
      |  FROM (SELECT vec_id, embedding FROM embeddings, nn
      |        WHERE vec_id % greatest(n // 8, 1) = 0 ORDER BY vec_id LIMIT 8)),
      |score AS (
      |  SELECT e.vec_id, c.cell,
      |    list_sum(list_transform(range(1, 65), i ->
      |      cast(e.embedding[i] as double) * (cast(c.cv[i] as double) /
      |        sqrt(list_sum(list_transform(range(1, 65), j ->
      |          cast(c.cv[j] as double) * cast(c.cv[j] as double))))))) AS s
      |  FROM embeddings e, cents c),
      |assign AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS rn
      |    FROM score) WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS rn
      |    FROM score WHERE vec_id < 3) WHERE rn <= 2),
      |resid AS (
      |  SELECT e.vec_id, a.cell,
      |    list_transform(range(1, 65), i -> e.embedding[i] - c.cv[i]) AS rv
      |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
      |  JOIN cents c ON a.cell = c.cell),
      |books AS (
      |  SELECT s.m, r.vec_id AS j,
      |    list_slice(r.rv, s.m*16 + 1, s.m*16 + 16) AS bv
      |  FROM resid r, (SELECT unnest(range(0, 4)) AS m) s
      |  WHERE r.vec_id < 16),
      |cdist AS (
      |  SELECT r.vec_id, b.m, b.j,
      |    list_sum(list_transform(range(1, 17), d ->
      |      (cast(r.rv[b.m*16 + d] as double) - cast(b.bv[d] as double)) *
      |      (cast(r.rv[b.m*16 + d] as double) - cast(b.bv[d] as double))))
      |      AS dist
      |  FROM resid r, books b),
      |codes AS (SELECT vec_id, m, j AS code FROM (
      |    SELECT vec_id, m, j,
      |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, j) AS rn
      |    FROM cdist) WHERE rn = 1),
      |qresid AS (
      |  SELECT p.query_id, p.cell,
      |    list_transform(range(1, 65), i -> e.embedding[i] - c.cv[i]) AS qrv
      |  FROM probes p JOIN embeddings e ON e.vec_id = p.query_id
      |  JOIN cents c ON c.cell = p.cell),
      |dtab AS (
      |  SELECT q.query_id, q.cell, b.m, b.j,
      |    list_sum(list_transform(range(1, 17), d ->
      |      (cast(q.qrv[b.m*16 + d] as double) - cast(b.bv[d] as double)) *
      |      (cast(q.qrv[b.m*16 + d] as double) - cast(b.bv[d] as double))))
      |      AS dist
      |  FROM qresid q, books b),
      |scored AS (
      |  SELECT t.query_id, c.vec_id AS neighbor_id,
      |    list_sum(list(t.dist ORDER BY t.m)) AS dist
      |  FROM codes c
      |  JOIN assign a ON a.vec_id = c.vec_id
      |  JOIN dtab t ON t.cell = a.cell AND t.m = c.m AND t.j = c.code
      |  WHERE c.vec_id <> t.query_id
      |  GROUP BY 1, 2),
      |ranked AS (SELECT query_id, neighbor_id, dist,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY dist, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, neighbor_id, round(dist, 6) AS adc_dist
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** IVF-PQ + exact re-rank ([[Ann.ivfPqRerankTopK]]) — the full
    * production retrieval chain: compressed-domain ADC shortlist (20)
    * inside the probed cells, then raw vectors fetched ONLY for the
    * shortlist and re-ranked by exact squared L2. The oracle extends
    * the [[qAnnIvfPq]] replay with the shortlist cut and the
    * three-`list_sum` exact distance — the entire chain hashes. */
  val qAnnIvfPqRerank: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    require(dims == 64,
      s"ann_ivfpq_rerank's DuckDB oracle replays 64-dim IVF-PQ " +
        s"machinery; embeddings are $dims-dim")
    Ann.ivfPqRerankTopK(e, e.filter(col("vec_id") < 3), "vec_id",
        "embedding", 5, shortlist = 20)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("l2_dist"), 6).as("l2_dist"))
      .orderBy("query_id", "rank")
  }

  val qAnnIvfPqRerankSql: String = {
    // everything through `ranked` is the ann_ivfpq_topk replay
    val base = qAnnIvfPqSql.substring(0, qAnnIvfPqSql.indexOf(
      "SELECT query_id, rank, neighbor_id"))
    base.trim + ",\n" +
      """shortlist AS (SELECT query_id, neighbor_id FROM ranked
        |  WHERE rank <= 20),
        |rr AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    (list_sum(list_transform(range(1, 65), i ->
        |        cast(q.embedding[i] as double) * cast(q.embedding[i] as double))) +
        |     list_sum(list_transform(range(1, 65), i ->
        |        cast(c.embedding[i] as double) * cast(c.embedding[i] as double)))) -
        |    2 * list_sum(list_transform(range(1, 65), i ->
        |        cast(q.embedding[i] as double) * cast(c.embedding[i] as double)))
        |      AS l2
        |  FROM shortlist s
        |  JOIN embeddings q ON q.vec_id = s.query_id
        |  JOIN embeddings c ON c.vec_id = s.neighbor_id),
        |rranked AS (SELECT query_id, neighbor_id, l2,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY l2, neighbor_id) AS rank
        |  FROM rr)
        |SELECT query_id, rank, neighbor_id, round(l2, 6) AS l2_dist
        |FROM rranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "embed_pq_codes" -> qEmbedPqCodes,
    "ann_pq_topk" -> qAnnPq,
    "ann_ivfpq_topk" -> qAnnIvfPq,
    "ann_ivfpq_rerank" -> qAnnIvfPqRerank,
    "ann_pq_recall" -> qAnnPqRecall,
    "embed_sq_codes" -> qEmbedSqCodes,
    "embed_pca_cov" -> qEmbedPcaCov,
    "embed_centroids" -> qEmbedCentroids,
    "embed_norms" -> qEmbedNorms,
    "ann_bruteforce_topk" -> qAnnBruteForce,
    "ann_lsh_topk" -> qAnnLsh,
    "ann_ivf_topk" -> qAnnIvf,
    "ann_recall" -> qAnnRecall,
    "dedup_embedding" -> qDedupEmbedding,
    "dedup_semantic" -> qDedupSemantic)

  val oracles: Map[String, String] = Map(
    "embed_pq_codes" -> qEmbedPqCodesSql,
    "ann_pq_topk" -> qAnnPqSql,
    "ann_ivfpq_topk" -> qAnnIvfPqSql,
    "ann_ivfpq_rerank" -> qAnnIvfPqRerankSql,
    "ann_pq_recall" -> qAnnPqRecallSql,
    "ann_recall" -> qAnnRecallSql,
    "embed_sq_codes" -> qEmbedSqCodesSql,
    "embed_pca_cov" -> qEmbedPcaCovSql,
    "embed_centroids" -> qEmbedCentroidsSql,
    "embed_norms" -> qEmbedNormsSql,
    "ann_bruteforce_topk" -> qAnnBruteForceSql,
    "ann_lsh_topk" -> qAnnLshSql,
    "ann_ivf_topk" -> qAnnIvfSql,
    "dedup_embedding" -> qDedupEmbeddingSql,
    "dedup_semantic" -> qDedupSemanticSql)
}
