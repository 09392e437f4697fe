package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** STRATIFIED fixed-k sample: the k rows with the smallest salted
    * 48-bit content hash per stratum — deterministic and order-free
    * like every sampler here, and executed with the bounded-heap top-k
    * AGGREGATE ([[graft.expressions.TopKByScore]] via [[Ann.topK]]):
    * map-side partials keep ≤ k rows per stratum per task and the
    * shuffle carries k·strata rows — never the per-stratum sort window
    * that funnels a hot stratum into one task. 48 bits fit a double
    * exactly, so the negated-score heap ranks identically to any
    * engine's `ORDER BY hash, id`.
    *
    * Returns (stratum, rank 1..k, id, h48). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      salt: String, k: Int): DataFrame = {
    val h48 = conv(
      substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 12),
      16, 10).cast("long")
    df.groupBy(col(stratumCol))
      .agg(Ann.topK(-h48.cast("double"), col(idCol), k).as("top"))
      .select(col(stratumCol), posexplode(col("top")))
      .select(col(stratumCol), (col("pos") + 1).cast("long").as("rank"),
        col("col.neighbor_id").as(idCol),
        (-col("col.cos_sim")).cast("long").as("h48"))
  }

  /** Temperature-weighted domain mixing: per-source acceptance
    * thresholds that reshape the corpus toward a token budget with
    * up-weighted small domains (the standard p^α multinomial mixture;
    * α = 0.5 fixed, i.e. weights ∝ √tokens — sqrt is correctly-rounded
    * IEEE so every engine computes the identical weight, which a general
    * pow(p, α) would not guarantee).
    *
    * Shape at 100 TB: ONE map-side-partial groupBy over the corpus to
    * get per-source token totals (the only shuffle, #sources rows out),
    * then pure arithmetic on that tiny frame. Callers broadcast-join
    * the result back onto the corpus and keep rows where
    * [[hashBucket]](id, salt, buckets) < threshold — no second shuffle,
    * no RNG, reproducible on backfill.
    *
    * Exactness contract (the DuckDB oracle matches bit-for-bit):
    * √tokens is fixed-pointed to 1e-6 and summed as integers
    * (order-free), all cross products are decimal(38,0) (no bigint
    * overflow at 100 TB token counts), and the final rate is ONE
    * correctly-rounded double division of two exact operands.
    *
    * Returns one row per source: (source, n_docs, n_toks, threshold)
    * where threshold ∈ [0, buckets] approximates
    * buckets · min(1, budget·q_s/T_s), q_s = √T_s / Σ√T. */
  /** DSIR-style importance resampling: re-weight a raw corpus toward a
    * TARGET distribution by the per-document ratio of target to raw
    * token probabilities, then accept each document with probability
    * proportional to its (capped) importance — the published
    * importance-resampling recipe for domain-targeted data selection,
    * in this suite's exact-integer form.
    *
    * Importance proxy (no logs, the [[graft.queries.TextQueries]]
    * oracle discipline): per token, `(target_count+1)·10⁶ div
    * (raw_count+1)` — add-one smoothed and monotone in the real
    * probability ratio; per document, the integer mean over its
    * tokens. Acceptance: `accept_ppm = min(10⁶, score div scale)`
    * parts-per-million against the salted-md5 hash bucket of the id —
    * the same deterministic-Bernoulli contract as [[sampleFilter]],
    * so the sample is engine-reproducible row for row.
    *
    * 100 TB shape: raw counts are ONE map-side-combined vocabulary
    * aggregate broadcast back onto the token stream (the
    * [[graft.queries.TextQueries]] rarity pattern), the target vocab
    * is a driver-supplied broadcast literal, and the per-doc score is
    * one groupBy(id) of (id, ratio) longs — document text never
    * shuffles. */
  def importanceResample(docs: DataFrame, idCol: String, textCol: String,
      targetVocab: Seq[(String, Long)], salt: String,
      scale: Long = 1L): DataFrame = {
    require(scale >= 1, s"scale=$scale")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("__tok"))
    val raw = toks.groupBy("__tok").agg(count(lit(1)).as("__rc"))
    val tgt = broadcast(targetVocab.toDF("__tok", "__tc"))
    toks.join(broadcast(raw), "__tok")
      .join(tgt, Seq("__tok"), "left")
      .select(col(idCol),
        expr("((coalesce(__tc, 0L) + 1L) * 1000000L) div (__rc + 1L)").as("__r"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), sum(col("__r")).as("__s"))
      .select(col(idCol), expr("__s div __n").as("score"))
      .withColumn("accept_ppm",
        least(lit(1000000L), expr(s"score div ${scale}L")))
      .withColumn("keep",
        hashBucket(col(idCol), salt, 1000000) < col("accept_ppm"))
  }

  def domainMixThresholds(perSourceToks: DataFrame, tokenBudget: Long,
      buckets: Int = 10000): DataFrame = {
    val s6 = round(sqrt(col("n_toks")) * 1e6).cast("long")
    val withSqrt = perSourceToks.withColumn("sqrt6", s6)
    val total = withSqrt.agg(sum("sqrt6").cast("long").as("sqrt6_total"))
    withSqrt.crossJoin(broadcast(total))
      .withColumn("thr",
        least(lit(buckets).cast("long"), round(
          (col("sqrt6").cast("decimal(38,0)") * tokenBudget * buckets)
            .cast("double") /
          (col("n_toks").cast("decimal(38,0)") * col("sqrt6_total"))
            .cast("double")).cast("long")))
      .drop("sqrt6", "sqrt6_total")
  }
}
