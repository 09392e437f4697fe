package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (the brief's "salting for skew"):
  * when one group key carries a disproportionate share of rows, a plain
  * groupBy funnels it into one reduce task. Salted two-phase
  * aggregation splits each key into `buckets` sub-keys (deterministic
  * per-row salt), partially aggregates per (key, salt) — distributing
  * the hot key over `buckets` tasks — then combines partials per key.
  *
  * Works for any DECOMPOSABLE aggregate (sum/count/min/max here). AQE's
  * skew handling covers joins; salting covers aggregations whose skew
  * AQE cannot split because a single key's partial state must meet.
  */
object Skew {

  /** Salted sum/count aggregation: `aggs` maps output column name to
    * (valueExpr, combiner), e.g. "n" -> (lit(1), sum). */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int)(
      sums: (String, Column)*): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sums.head._2.as(sums.head._1),
        sums.tail.map { case (n, c) => c.as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(sums.head._1).as(sums.head._1),
        sums.tail.map { case (n, _) => sum(n).as(n) }: _*)
  }
}
