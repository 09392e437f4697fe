package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}

/** Deterministic sampling, decontamination, and sessionization specs. */
class TrainPrepSpec extends SparkSpec {

  import spark.implicits._

  test("hashBucket is deterministic, order-free, and well-spread") {
    val ids = (0L until 2000L).toDF("id")
    val b = ids.select(Sampling.hashBucket(col("id"), "s:", 100).as("b"))
    val again = ids.orderBy(col("id").desc)
      .select(Sampling.hashBucket(col("id"), "s:", 100).as("b"))
    assert(b.groupBy("b").count().count() == 100) // every bucket hit
    assert(b.agg(min("b"), max("b")).as[(Long, Long)].head() == ((0L, 99L)))
    // identical multiset regardless of input order
    assert(b.groupBy("b").count().orderBy("b").as[(Long, Long)].collect()
      .sameElements(again.groupBy("b").count().orderBy("b").as[(Long, Long)].collect()))
    // roughly uniform: each bucket within 3x of the expected 20
    val counts = b.groupBy("b").count().as[(Long, Long)].collect().map(_._2)
    assert(counts.min > 5 && counts.max < 60, s"skewed: ${counts.min}..${counts.max}")
  }

  test("assignSplit respects cumulative percentages") {
    val r = spark.range(100).select(
      Sampling.assignSplit(col("id"), 80, 10).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(r == Map("train" -> 80L, "val" -> 10L, "test" -> 10L))
  }

  test("ngramContamination flags exactly the overlapping docs") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),          // benchmark
      (1L, "alpha beta gamma delta epsilon"),  // shares the 3-gram runs
      (2L, "zeta eta theta iota"),             // disjoint
      (3L, "alpha beta gamma")                 // shares one 3-gram
    ).toDF("doc_id", "text")
    val out = Dedup.ngramContamination(docs, "doc_id", "text",
        col("doc_id") === 0, n = 3)
      .orderBy("id").as[(Long, Long, Boolean)].collect()
    // doc1 shares "alpha beta gamma" + "beta gamma delta"; doc3 shares 1
    assert(out.toSeq == Seq((1L, 2L, true), (2L, 0L, false), (3L, 1L, true)))
  }

  test("session_window sessions match the gap-and-island formulation") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 02:00:00", 2.0), // same session (2h < 6h)
      (1L, "2024-01-01 09:00:00", 3.0), // new session (7h gap)
      (2L, "2024-01-01 00:00:00", 4.0)
    ).toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
    val s = ev.groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("sw"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("user_id"), col("sw.start").cast("string").as("start"),
        col("n"), col("v"))
      .orderBy("user_id", "start")
      .collect().toSeq
    assert(s == Seq(
      Row(1L, "2024-01-01 00:00:00", 2L, 3.0),
      Row(1L, "2024-01-01 09:00:00", 1L, 3.0),
      Row(2L, "2024-01-01 00:00:00", 1L, 4.0)))
  }

  test("domainMixThresholds up-weights small domains at alpha=0.5") {
    // big domain has 100x the tokens: with q ∝ √T the acceptance RATE
    // ratio small/big must be √100 = 10 (rate_s ∝ 1/√T_s), and the
    // threshold must never exceed the bucket count.
    val per = Seq(("big", 1000000L), ("small", 10000L)).toDF("source", "n_toks")
    val thr = Sampling.domainMixThresholds(per, tokenBudget = 100000)
      .select(col("source"), col("thr")).as[(String, Long)].collect().toMap
    assert(thr("small") <= 10000 && thr("big") <= 10000)
    assert(thr("small") > 0 && thr("big") > 0)
    val ratio = thr("small").toDouble / thr("big")
    assert(math.abs(ratio - 10.0) < 0.05, s"ratio $ratio")
  }

  test("domainMixThresholds caps the rate at 1") {
    // budget far above the corpus: every domain saturates at buckets
    val per = Seq(("a", 100L), ("b", 400L)).toDF("source", "n_toks")
    val thr = Sampling.domainMixThresholds(per, tokenBudget = 1000000)
      .select(col("thr")).as[Long].collect()
    assert(thr.forall(_ == 10000L))
  }

  test("importanceResample: target-heavy docs saturate, others gate on the hash") {
    // raw counts: aa and bb both 2. ratio(aa) = 10*10^6 div 3 = 3333333,
    // ratio(bb) = 1*10^6 div 3 = 333333. Doc 1 saturates accept_ppm at
    // 10^6 (always kept); doc 2 keeps iff its hash bucket < 333333.
    val docs = Seq((1L, "aa aa"), (2L, "bb bb")).toDF("doc_id", "text")
    val got = Sampling.importanceResample(docs, "doc_id", "text",
        Seq("aa" -> 9L), "dsir:")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((3333333L, 1000000L, true)))
    val h2 = docs.filter(col("doc_id") === 2)
      .select(Sampling.hashBucket(col("doc_id"), "dsir:", 1000000))
      .as[Long].collect().head
    assert(got(2L) === ((333333L, 333333L, h2 < 333333L)))
  }

  test("leakage safety: split is constant within a near-dup cluster") {
    // two clusters: {0,1} near-dups, {2} alone — reps hash identically
    val comp = Seq((0L, 0L), (1L, 0L), (2L, 2L)).toDF("id", "cluster_rep")
    val splits = comp.select(col("cluster_rep"),
        Sampling.assignSplit(
          Sampling.hashBucket(col("cluster_rep"), "split:", 100), 80, 10).as("split"))
      .groupBy("cluster_rep").agg(countDistinct("split").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(splits.values.forall(_ == 1L))
  }
}
