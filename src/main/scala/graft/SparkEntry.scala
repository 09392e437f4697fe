package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one implemented operator from SURVEY §2
  * (or a north-star LLM-pipeline operator); [[oracleSql]] carries the
  * DuckDB-equivalent SQL for every hash-checkable query. Queries without
  * an oracle entry (murmur3-based LSH variants, geometry ops not
  * expressible in stock DuckDB) get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The conservative-regrid overlay is SURVEY §3.3's "one real
    * query" — it exercises scans, geometry construction, the bucketed
    * spatial join, overlay intersection, and weighted aggregation. */
  def entry(spark: SparkSession): DataFrame =
    GeoQueries.qOverlayRegrid(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      TextQueries.queries ++
      TrainPrepQueries.queries ++
      AnnQueries.queries ++
      GeoQueries.queries ++
      MultimodalQueries.queries ++
      GridQueries.queries ++
      StreamingQueries.queries ++
      ValidationQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      TextQueries.oracles ++
      TrainPrepQueries.oracles ++
      AnnQueries.oracles ++
      GeoQueries.oracles ++
      MultimodalQueries.oracles ++
      GridQueries.oracles ++
      StreamingQueries.oracles ++
      ValidationQueries.oracles
}
