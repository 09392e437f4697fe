package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.expressions.ZOrderValue

/** Data-layout clustering for write paths at scale.
  *
  * On 100 TB, query cost is dominated by how much of the table a scan
  * must read; the layout of rows into files decides that. Z-ordering
  * range-partitions rows by the Morton interleave of several key
  * columns, so each output file covers a small hyper-rectangle of the
  * key space: a range predicate on ANY of the dimensions then touches
  * few files (parquet footer min/max stats skip the rest), instead of
  * only predicates on the single leading sort column.
  */
object Layout {

  /** Morton (Z-order) value of `cols` (each masked to `bits` bits) —
    * a compiled expression ([[ZOrderValue]]). */
  def zorderValue(cols: Seq[Column], bits: Int): Column =
    Bridge.column(ZOrderValue(cols.map(c =>
      Bridge.expression(c.cast("long"))), bits))

  /** Cluster a frame for writing: range-partition by z-value into
    * `numFiles` partitions and sort within each. One shuffle (the range
    * exchange samples z boundaries), then a per-partition sort —
    * exactly what `df.write` needs for footer-stat locality on every
    * z dimension. */
  def clusterByZ(df: DataFrame, cols: Seq[Column], bits: Int,
      numFiles: Int): DataFrame = {
    val z = zorderValue(cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
