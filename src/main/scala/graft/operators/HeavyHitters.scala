package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT corpus heavy hitters in two passes — the frequent-items
  * pattern that works when the item space (n-grams, URLs, hosts) is
  * far too large to aggregate exactly but the ANSWER is small:
  *
  *  pass 1  per-partition Misra-Gries summaries of capacity c — the
  *          classic guarantee composes across partitions: an item
  *          absent from EVERY partition summary has per-partition
  *          count ≤ Nₚ/(c+1), hence global count ≤ N/(c+1). The
  *          union of summaries is therefore a SUPERSET of every item
  *          with global count > N/(c+1);
  *  pass 2  exact counts for candidate items only (broadcast
  *          candidate set, map-side semi filter), HAVING ≥ support.
  *
  * Choosing capacity ≥ N/support makes the result EXACTLY
  * `GROUP BY item HAVING count ≥ support` — the operator recomputes N
  * during pass 2 and fails loudly if the caller's capacity did not
  * cover it (silent under-capacity would silently drop heavy items).
  *
  * 100 TB shape: pass 1 shuffles ≤ c candidate strings per partition
  * (the corpus-sized gram stream never shuffles); pass 2 is a
  * broadcast-filtered partial-aggregated count of candidate hits
  * only. Both passes are one corpus scan each.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries: capacity-bounded counter map; on
    * overflow every counter decrements (amortized via a batch sweep),
    * evicting zeros. Returns the surviving keys. */
  private[graft] def misraGries(items: Iterator[String],
      capacity: Int): Iterator[String] = {
    val counts = new mutable.HashMap[String, Long]()
    items.foreach { item =>
      counts.get(item) match {
        case Some(c) => counts.update(item, c + 1)
        case None if counts.size < capacity => counts.update(item, 1L)
        case None => // decrement-all sweep (the MG step), drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace { (_, c) => c - 1 }
          counts.foreach { case (k, c) => if (c == 0L) dead += k }
          dead.foreach(counts.remove)
      }
    }
    counts.keysIterator
  }

  /** All `exprCol` values with exact corpus count ≥ `support`.
    * Output: (item, n) — identical to the plain GROUP BY / HAVING,
    * guaranteed by requiring capacity ≥ N/support (checked against
    * the true N, loudly).
    *
    * Exactly TWO corpus scans: the MG pass emits one
    * (partitionCount, candidates) row per partition, so both the
    * candidate set and the true N come out of scan 1 (cached — it is
    * #partitions rows); scan 2 is the broadcast-filtered exact
    * count. */
  def frequentItems(df: DataFrame, itemCol: Column, support: Long,
      capacity: Int): DataFrame = {
    require(support >= 1 && capacity >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(itemCol.cast("string").as("item"))
    val summaries = items.as[String]
      .mapPartitions { it =>
        var n = 0L
        val counted = it.map { x => n += 1; x }
        val cands = misraGries(counted, capacity).toArray
        Iterator.single((n, cands))
      }.toDF("part_n", "cands")
      .cache()
    val n = summaries.agg(coalesce(sum("part_n"), lit(0L))).head().getLong(0)
    require(n / (capacity + 1L) < support,
      s"capacity $capacity cannot guarantee support $support at N=$n " +
        s"(need capacity ≥ ${n / support + 1})")
    val candidates = summaries.select(explode(col("cands")).as("item")).distinct()
    val counted = items.join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") >= support)
    counted
  }

  /** Word n-grams with multiplicity (NOT the per-doc distinct shingle
    * set): the gram stream feeding [[frequentItems]]. One compiled
    * pass per row ([[graft.expressions.WordNgrams]]) — the equivalent
    * transform/slice/concat_ws HOF chain evaluates interpreted per
    * element and was the dominant cost of the heavy-hitter scans.
    * Documents shorter than n emit one all-token gram (the
    * [[Dedup.shingles]] contract). */
  def ngrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.WordNgrams(
        Seq(org.apache.spark.sql.graftbridge.Bridge.expression(text)), n))
}
