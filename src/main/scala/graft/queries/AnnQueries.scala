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

  /** LSH-bucketed ANN (murmur3-derived hyperplanes → rows-only check). */
  val qAnnLsh: Q = (spark, dir) => {
    val e = Tables(spark, dir, "embeddings")
    Ann.lshTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "embed_norms" -> qEmbedNorms,
    "ann_bruteforce_topk" -> qAnnBruteForce,
    "ann_lsh_topk" -> qAnnLsh)

  val oracles: Map[String, String] = Map(
    "embed_norms" -> qEmbedNormsSql,
    "ann_bruteforce_topk" -> qAnnBruteForceSql)
}
