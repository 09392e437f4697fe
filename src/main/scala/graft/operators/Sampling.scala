package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data
  * pipelines.
  *
  * A 100 TB corpus can't use `rand()` for holdout splits — the
  * assignment must be reproducible across reruns, engines, and
  * backfills, and must never depend on row order or partitioning. The
  * standard trick is a salted content hash: bucket = md5(salt || key)
  * mod B. Everything here is a pure codegen'd Column expression — no
  * shuffle, no state, no RNG; the split of any row can be recomputed
  * by any engine that has md5 (the DuckDB oracle does exactly that).
  *
  * For LEAKAGE-SAFE splits, hash a cluster representative (e.g.
  * [[Dedup.connectedComponents]]' `cluster_rep`) instead of the row id:
  * near-duplicate documents then land in the same split by
  * construction, so the eval set can't leak training near-copies.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets): md5 of the salted key,
    * first 15 hex digits (60 bits — fits a signed long) mod buckets.
    * Oracle-exact: DuckDB computes `('0x'||substr(md5(salt||key),1,15))
    * ::BIGINT % buckets` for the same value. */
  def hashBucket(key: Column, salt: String, buckets: Int): Column = {
    require(buckets > 0, s"buckets=$buckets")
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % buckets
  }

  /** Map a [0,100) bucket to train/val/test by cumulative percentage. */
  def assignSplit(bucket: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic Bernoulli sample at `pct` percent: keep iff the
    * salted hash bucket falls below pct. Same reproducibility contract
    * as [[hashBucket]]. */
  def sampleFilter(key: Column, salt: String, pct: Int): Column =
    hashBucket(key, salt, 100) < pct
}
