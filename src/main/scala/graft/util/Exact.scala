package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent exact aggregation helpers.
  *
  * Spark sums doubles in partial/final aggregation whose addition order
  * depends on partitioning; DuckDB (the correctness oracle) sums
  * sequentially. Plain `sum(double)` therefore differs in the low bits and
  * breaks hash comparison. For fixed-point data (prices with 2 decimals,
  * metric values with bounded precision) we instead sum exact integer
  * units (`long` — associative, order-independent) and divide back once.
  * The final integer→double division is a single IEEE op, identical on
  * both engines.
  */
object Exact {

  /** Exact sum of a fixed-point column with `dec` decimal digits.
    * Accumulates in decimal(38,0) so the integer sum cannot overflow at
    * ~1e10+ rows (long units would wrap silently at 100 TB scale while
    * the DuckDB oracle promotes to HUGEINT). The final decimal→double
    * division is a single IEEE op, identical on both engines. */
  def fixedSum(c: Column, dec: Int): Column = {
    val unit = math.pow(10, dec)
    sum(round(c * unit).cast("decimal(38,0)")).cast("double") / lit(unit)
  }

  /** Exact mean of a fixed-point column with `dec` decimal digits. */
  def fixedAvg(c: Column, dec: Int): Column = {
    val unit = math.pow(10, dec)
    sum(round(c * unit).cast("decimal(38,0)")).cast("double") /
      (count(lit(1)) * lit(unit))
  }

  /** Overflow-safe exact sum of an integer-valued column: accumulate in
    * decimal(38,0), emit double (one rounding step, both engines agree). */
  def longSum(c: Column): Column =
    sum(c.cast("decimal(38,0)")).cast("double")

  /** SQL fragment equivalents for the DuckDB oracle. */
  def sqlFixedSum(expr: String, dec: Int): String = {
    val unit = "1" + "0" * dec
    s"sum(cast(round(($expr) * $unit) as bigint)) / $unit.0"
  }

  def sqlFixedAvg(expr: String, dec: Int): String = {
    val unit = "1" + "0" * dec
    s"sum(cast(round(($expr) * $unit) as bigint)) / (count(*) * $unit.0)"
  }
}
