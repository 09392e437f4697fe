package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide token co-occurrence with a PMI-style association score —
  * the collocation/phrase-mining primitive (word2vec-style context
  * statistics, stopword-pair detection, multi-word-entity discovery)
  * over a training corpus.
  *
  * Shape at 100 TB: candidate pairs are generated IN-ROW by a higher-
  * order-function chain over each document's token array (one struct
  * per (i, i+d) slot, d ≤ `maxDist`) — no positional self-join, so the
  * only shuffles are the map-side-combined groupBys on compact string
  * pair/unigram keys and the vocabulary-keyed join of pair counts to
  * the two unigram counts. The corpus total is a 1-row frame broadcast
  * back. Association is the integer PMI proxy
  * `(n_ab · N · 10⁶) div (n_a · n_b)` — monotone in the true
  * pointwise-mutual-information odds ratio but computed entirely in
  * decimal(38,0) integer space, so results hash-match an independent
  * SQL replay bit-for-bit (a float log would differ in ulps).
  */
object Cooccur {

  /** Unordered token pairs within `maxDist` positions, one struct per
    * occurrence slot, generated per-row. Pairs are canonicalized
    * (lexicographic least/greatest) so (a,b) and (b,a) accumulate
    * together. Guarded `when` keeps every `slice` index in range —
    * ANSI mode never sees an out-of-bounds access. */
  private def pairSlots(toks: Column, maxDist: Int): Column =
    flatten(transform(sequence(lit(1), lit(maxDist)), d =>
      when(size(toks) > d,
        transform(sequence(lit(1), size(toks) - d), i => {
          val x = element_at(toks, i)
          val y = element_at(toks, i + d)
          struct(least(x, y).as("a"), greatest(x, y).as("b"))
        }))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))))

  /** Top-`topK` co-occurring pairs (by count, ties broken
    * lexicographically) with unigram counts and the integer PMI proxy.
    * Emits (a, b, n_ab, n_a, n_b, ratio_ppm). */
  def topPairs(df: DataFrame, textCol: String, maxDist: Int = 2,
      topK: Int = 100): DataFrame = {
    require(maxDist >= 1, s"maxDist=$maxDist")
    val dec = "decimal(38,0)"
    val toks = df.select(split(trim(lower(col(textCol))), "\\s+").as("ts"))
    val pc = toks.select(explode(pairSlots(col("ts"), maxDist)).as("p"))
      .select(col("p.a"), col("p.b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val uc = toks.select(explode(col("ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n_t"))
    val tot = uc.agg(sum("n_t").cast(dec).as("n"))
    // the ranking key (n_ab desc, a, b) is fully known BEFORE the
    // unigram joins, so take the top-k first (a TakeOrdered over the
    // grouped pairs) and join only those `topK` winners to the
    // vocabulary counts — the former order joined every distinct pair
    // (~30M at the 1M-doc scale point) through two string-keyed joins
    // just to throw all but k rows away
    val top = pc.orderBy(col("n_ab").desc, col("a"), col("b")).limit(topK)
    broadcast(top)
      .join(uc.select(col("t").as("a"), col("n_t").as("n_a")), "a")
      .join(uc.select(col("t").as("b"), col("n_t").as("n_b")), "b")
      .crossJoin(broadcast(tot))
      .withColumn("ratio_ppm", expr(
        s"(CAST(n_ab AS $dec) * n * 1000000) div " +
          s"(CAST(n_a AS $dec) * CAST(n_b AS $dec))"))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("ratio_ppm"))
      .orderBy(col("n_ab").desc, col("a"), col("b"))
  }
}
