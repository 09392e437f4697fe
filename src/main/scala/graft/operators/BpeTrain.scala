package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** BPE vocabulary TRAINING — learn a merge list from the corpus, the
  * counterpart of the [[graft.expressions.BpeTokenize]] encoder (which
  * consumes a merges file someone else produced; this produces it).
  *
  * Algorithm (the classic corpus-frequency trainer): reduce the corpus
  * ONCE to a distinct-pre-token count table — pair statistics are
  * word-count weighted, so no round ever rescans the corpus — then per
  * round re-segment each distinct word under the merges learned so far
  * (a compiled [[graft.expressions.BpeSegment]] projection), count
  * adjacent symbol pairs weighted by word frequency (map-side combined
  * groupBy on compact `"a b"` keys), and adopt the most frequent pair
  * as the next merge (ties lexicographic — deterministic, engine-
  * reproducible).
  *
  * Shape at 100 TB: one full-corpus aggregation up front (tokens →
  * distinct words, the same reduction every published BPE trainer
  * uses); each of the k rounds then runs over the distinct-word table
  * — typically 4–6 orders of magnitude smaller than the corpus — and
  * collects exactly ONE row (the argmax), mirroring the per-iteration
  * driver discipline of [[PageRank]]. The learned list feeds
  * [[graft.expressions.BpeTokenize]] unchanged.
  */
object BpeTrain {

  /** The pre-tokenizer as a SQL projection — identical splits to the
    * compiled expressions' `Bpe.forEachSymbol` (letter runs, digit
    * runs, single other non-space characters, after lowercasing). */
  def preTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  private def segment(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(graft.expressions.BpeSegment(
      Seq(Bridge.expression(word)), merges))

  /** Learn `k` merges from `df(textCol)`; returns (rank, pair, n) —
    * the merge's position, its `"a b"` key, and its corpus-weighted
    * adjacent-pair count at adoption time. Stops early if no adjacent
    * pair remains. */
  def learnMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(preTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist()
    try {
      val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      var merges = Vector.empty[(String, String)]
      var r = 0
      var exhausted = false
      while (r < k && !exhausted) {
        val syms = segment(col("w"), merges)
        val top = words.select(col("c"), syms.as("s"))
          .select(col("c"), explode(
            when(size(col("s")) >= 2,
              transform(sequence(lit(1), size(col("s")) - 1), i =>
                concat(element_at(col("s"), i), lit(" "),
                  element_at(col("s"), i + 1))))
              .otherwise(array().cast("array<string>"))).as("p"))
          .groupBy("p").agg(sum("c").as("n"))
          .orderBy(desc("n"), asc("p"))
          .limit(1)
          .as[(String, Long)].collect()
        if (top.isEmpty) exhausted = true
        else {
          val (pair, n) = top.head
          learned += ((r.toLong, pair, n))
          val Array(a, b) = pair.split(" ", 2)
          merges :+= (a -> b)
          r += 1
        }
      }
      learned.toSeq.toDF("rank", "pair", "n").orderBy("rank")
    } finally { words.unpersist(); () }
  }
}
