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
  * Works for any DECOMPOSABLE aggregate: each entry supplies BOTH the
  * partial aggregate and the function that combines partials (sum
  * partials combine by sum, count by sum, min by min, max by max). AQE's
  * skew handling covers joins; salting covers aggregations whose skew
  * AQE cannot split because a single key's partial state must meet.
  */
object Skew {

  /** Salted two-phase aggregation. Each agg is
    * `(outName, partialAgg, combinePartials)` — e.g. a count is
    * `("n", count(lit(1)), sum(_))` (count partials combine by SUM,
    * never count), a min is `("m", min(c), min(_))`. */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int)(
      aggs: (String, Column, Column => Column)*): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c, _) => c.as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _, f) => f(col(n)).as(n) }: _*)
  }
}
