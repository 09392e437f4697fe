package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE (upsert) — the table-maintenance primitive of an
  * incrementally-refreshed corpus: a batch of updated + brand-new
  * rows folded into the standing table, source winning on key
  * collision (the "WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN
  * INSERT" contract, without a table format's transaction log).
  *
  * One full-outer join on the key — the single shuffle; at 100 TB
  * both sides live bucketed by the key, so the join co-locates
  * shuffle-free and the rewrite touches only changed buckets (the
  * `pipeline_docprep` bucketed-corpus discipline applied to
  * maintenance).
  */
object Merge {

  /** `target` upserted with `source` (identical schemas): source rows
    * replace target rows sharing `keyCol`, unmatched source rows
    * insert, unmatched target rows persist. */
  def upsert(target: DataFrame, source: DataFrame, keyCol: String): DataFrame = {
    val cols = target.columns
    require(source.columns.sameElements(cols),
      s"schema mismatch: ${cols.toSeq} vs ${source.columns.toSeq}")
    val t = target.select(cols.map(c => col(c).as("__t_" + c)).toSeq: _*)
    val s = source.select(cols.map(c => col(c).as("__s_" + c)).toSeq: _*)
    // row-wise winner keyed on the source KEY's presence (a per-column
    // coalesce would resurrect target values under legitimate source
    // NULLs)
    val useSrc = col("__s_" + keyCol).isNotNull
    t.join(s, col("__t_" + keyCol) === col("__s_" + keyCol), "full_outer")
      .select(cols.map(c =>
        when(useSrc, col("__s_" + c)).otherwise(col("__t_" + c)).as(c)).toSeq: _*)
  }

  /** Slowly-changing-dimension (type 2) history build from a
    * transaction log: collapse consecutive identical values of
    * `attrCol` per `keyCol` (ordered by `orderCols`) into versioned
    * rows with `[valid_from, valid_to)` ranges, `valid_to` NULL on the
    * open current version.
    *
    * The entire computation is window functions over ONE hash
    * partitioning on the key — a single shuffle regardless of how
    * many versions a key has; no self-joins, no iteration. `orderCols`
    * must be a deterministic total order within each key (pass a
    * tiebreaker column alongside the timestamp) or version boundaries
    * are nondeterministic under shuffle.
    */
  def scd2FromLog(log: DataFrame, keyCol: String, attrCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need an ordering")
    val ord = orderCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    // a version starts where the attribute differs from the previous
    // log row (or at the key's first row)
    val starts = log
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> col(attrCol)))
      .drop("__prev")
    // valid_to = next version's start; version_nr for lineage
    val wv = Window.partitionBy(keyCol).orderBy(ord: _*)
    starts
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(wv))
      .withColumn("version_nr", row_number().over(wv))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
