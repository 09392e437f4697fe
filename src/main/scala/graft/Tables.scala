package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Session invariants for oracle parity, set before ANY read so no
    // earlier load can cache a schema under different settings: UTC
    // timestamps (window()/date casts are TZ-sensitive; the DuckDB oracle
    // uses naive timestamps) and nanos-as-long parquet reads.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read it as a long and truncate ns→µs exactly the
      // way DuckDB does (integer division, no double round-trip — ns
      // epoch values exceed double's 2^53 exact range).
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
