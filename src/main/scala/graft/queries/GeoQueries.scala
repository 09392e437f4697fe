package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Geometry-operator coverage (SURVEY §2.3 J3/J4, §2.7) — filled in by
  * the geometry milestone; empty maps keep SparkEntry stable. */
object GeoQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
