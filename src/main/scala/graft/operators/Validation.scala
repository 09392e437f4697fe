package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ-style constraint
  * suite a production ingest pipeline runs before data is allowed into
  * the corpus). Three evaluation shapes, each chosen for the 100 TB
  * path:
  *
  *   - [[rowChecks]]: ALL row-level constraints (completeness, value
  *     sets, regex shape, numeric ranges) evaluate in ONE aggregate
  *     pass — map-side partial aggregation reduces every partition to
  *     a handful of counters, so the table is scanned exactly once no
  *     matter how many checks are attached.
  *   - [[uniqueKey]]: key-uniqueness as the two-stage count — one
  *     shuffle on the key (the minimum possible for an exact answer).
  *   - [[referential]]: orphan counting as a single left join (one
  *     pass over the child; Catalyst broadcasts the parent key side
  *     when it is small).
  *
  * Every check emits the same long-form row — `(check_name, target,
  * metric_num, metric_den, passed)` — with the metric as an EXACT
  * integer numerator/denominator pair rather than a float ratio, so
  * results hash-match any engine bit-for-bit and thresholds compare in
  * integer space: `num/den ≥ f` is evaluated as
  * `num * 1e6 ≥ round(f*1e6) * den`, overflow-safe to ~9e12-row
  * tables.
  *
  * Reference scope: the reference pipeline validates inputs implicitly
  * (`delphine/regrid.py:198-206` hard-asserts grid monotonicity before
  * regridding); this operator generalizes that gate to declarative,
  * engine-checked constraints.
  */
object Validation {

  private val Million = 1000000L

  /** One row-level constraint: contributes one counter expression to
    * the shared aggregate pass.
    *
    * @param name     check family name (emitted in `check_name`)
    * @param target   column (or label) the check applies to
    * @param num      aggregate producing the exact integer numerator
    * @param den      aggregate producing the exact integer denominator
    * @param passed   integer-space pass predicate over (num, den)
    */
  final case class RowCheck(name: String, target: String,
      num: Column, den: Column, passed: (Column, Column) => Column)

  /** Fraction-threshold pass rule in exact integer space. */
  private def atLeastFrac(minFraction: Double): (Column, Column) => Column = {
    val f = math.round(minFraction * Million)
    (num, den) => num * Million >= lit(f) * den
  }

  /** Non-null fraction of `column` must reach `minFraction`. */
  def completeness(column: String, minFraction: Double = 1.0): RowCheck =
    RowCheck("completeness", column,
      count(col(column)), count(lit(1)), atLeastFrac(minFraction))

  /** Fraction of rows whose `column` is in `values` must reach
    * `minFraction` (nulls count as violations). */
  def inSet(column: String, values: Seq[String],
      minFraction: Double = 1.0): RowCheck =
    RowCheck("in_set", column,
      sum(when(col(column).isin(values: _*), 1L).otherwise(0L)),
      count(lit(1)), atLeastFrac(minFraction))

  /** Fraction of rows whose `column` matches `regex` must reach
    * `minFraction`. */
  def matches(column: String, regex: String,
      minFraction: Double = 1.0): RowCheck =
    RowCheck("matches", column,
      sum(when(col(column).rlike(regex), 1L).otherwise(0L)),
      count(lit(1)), atLeastFrac(minFraction))

  /** Fraction of rows with `lo ≤ column ≤ hi` must reach
    * `minFraction`. */
  def inRange(column: String, lo: Double, hi: Double,
      minFraction: Double = 1.0): RowCheck =
    RowCheck("in_range", column,
      sum(when(col(column) >= lo && col(column) <= hi, 1L).otherwise(0L)),
      count(lit(1)), atLeastFrac(minFraction))

  /** min(column) ≥ bound, compared exactly in scaled-cents space.
    * Emits num = round(min*100), den = 100 (the scale), so the metric
    * row doubles as the observed minimum. */
  def minAtLeast(column: String, bound: Double): RowCheck =
    RowCheck("min_at_least", column,
      round(min(col(column)) * 100).cast("long"), lit(100L),
      (num, _) => num >= math.round(bound * 100))

  /** max(column) ≤ bound in scaled-cents space. */
  def maxAtMost(column: String, bound: Double): RowCheck =
    RowCheck("max_at_most", column,
      round(max(col(column)) * 100).cast("long"), lit(100L),
      (num, _) => num <= math.round(bound * 100))

  /** Table must have at least `minRows` rows. */
  def nonEmpty(label: String, minRows: Long = 1L): RowCheck =
    RowCheck("non_empty", label,
      count(lit(1)), lit(1L), (num, _) => num >= minRows)

  /** Evaluate every row-level check in ONE aggregate pass over `df`.
    * The plan is a single scan → partial agg → 1-row exchange → final
    * agg → explode back to long form; adding checks adds counters, not
    * passes. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "rowChecks needs at least one check")
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(c.num.cast("long").as(s"num_$i"), c.den.cast("long").as(s"den_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), lit(c.target).as("target"),
        col(s"num_$i").as("metric_num"), col(s"den_$i").as("metric_den"),
        c.passed(col(s"num_$i"), col(s"den_$i")).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Exact key-uniqueness: `num` = number of key groups appearing more
    * than once, `den` = number of distinct keys. Two-stage aggregation
    * — one shuffle on the key columns, the minimum for an exact
    * duplicate count. */
  def uniqueKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    val grouped = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
    grouped.agg(
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).cast("long").as("metric_num"),
        count(lit(1)).cast("long").as("metric_den"))
      .select(lit("unique_key").as("check_name"),
        lit(keys.mkString(",")).as("target"),
        col("metric_num"), col("metric_den"),
        (col("metric_num") === 0L).as("passed"))
  }

  /** Referential integrity: rows of `child` whose `childKey` has no
    * match in `parent.parentKey`. One left join over the child (parent
    * side reduced to its distinct keys first, so only keys shuffle —
    * or broadcast when small); `num` = orphan rows, `den` = child
    * rows. */
  def referential(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__ck"))
      .join(pk, col("__ck") === col("__pk"), "left")
      .agg(sum(when(col("__pk").isNull, 1L).otherwise(0L)).cast("long")
          .as("metric_num"),
        count(lit(1)).cast("long").as("metric_den"))
      .select(lit("referential").as("check_name"),
        lit(s"$childKey->$parentKey").as("target"),
        col("metric_num"), col("metric_den"),
        (col("metric_num") === 0L).as("passed"))
  }
}
