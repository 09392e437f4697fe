package graft.operators

import org.apache.spark.sql.DataFrame
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
}
