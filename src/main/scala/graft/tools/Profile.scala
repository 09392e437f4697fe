package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.operators.Dedup

/** Dev-only stage profiler for the hot dedup/ann paths (not part of the
  * engine API; run with `sbt "runMain graft.tools.Profile"`). */
object Profile {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")

    // --- simhash stages
    val fpHof = docs
      .select(col("doc_id").cast("long").as("id"),
        Dedup.simhashTokenHashes(col("text"), 48).as("th"))
      .select(col("id"), Dedup.simhashFromHashes(col("th"), 48).as("fp"))
    time("simhash: token hashes (HOF)") {
      docs.select(col("doc_id"), Dedup.simhashTokenHashes(col("text"), 48).as("th"))
    }
    time("simhash: fingerprint (HOF)") { fpHof }
    time("simhash: full query") {
      Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 6, bits = 48)
    }

    // --- minhash stages
    val sets = docs.select(col("doc_id").cast("long").as("id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    time("minhash: shingles (HOF)") { sets }
    time("minhash: signature (HOF)") {
      sets.select(col("id"), Dedup.minhashFromShingles(col("sh"), 32).as("sig"))
    }
    time("minhash: candidates") {
      Dedup.minhashCandidates(docs, "doc_id", "text", 3, 32, 16)
    }
    time("minhash: full") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 0.5)
    }

    // --- jaccard stages
    time("jaccard: full indexed") {
      Dedup.jaccardPairsIndexed(docs, "doc_id", "text", 3, 0.5)
    }

    // --- connected components stages
    time("components: pairs only") {
      Dedup.jaccardPairsIndexed(docs, "doc_id", "text", 3, 0.5)
        .select("id_a", "id_b")
    }
    time("components: full") {
      Dedup.connectedComponents(
        docs.select(col("doc_id").cast("long").as("id")),
        Dedup.jaccardPairsIndexed(docs, "doc_id", "text", 3, 0.5)
          .select("id_a", "id_b"))
    }

    // --- ann stages
    val emb = Tables(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") % 667 === 0)
    time("ann: lshBucket corpus (HOF)") {
      emb.select(col("vec_id"), graft.operators.Ann.lshBucket(col("embedding"), 8).as("b"))
    }
    time("ann: lsh full") {
      graft.operators.Ann.lshTopK(emb, queries, "vec_id", "embedding", 5)
    }
    spark.stop()
  }
}
