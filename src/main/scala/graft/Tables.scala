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
      // events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
      // vectorized reader rejects — read as long, truncate ns→µs with
      // integer division exactly the way DuckDB does; ns epoch values
      // exceed double's 2^53 exact range) and as TIMESTAMP(MICROS)
      // (reads as TIMESTAMP_NTZ — cast to session-TZ timestamp, which
      // under the UTC invariant above is wall-clock preserving and
      // matches DuckDB's naive-timestamp replay). Dispatch on the type
      // actually found so both generations of testdata load.
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ =>
          df.withColumn("ts", expr("cast(ts as timestamp)"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
