package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, Dedup}

class BloomSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives, false positives inside the design envelope") {
    val f = Bloom.empty(10000, bitsPerKey = 10)
    val members = (0L until 10000L).map(i => i * 0x9e3779b97f4a7c15L)
    members.foreach(f.set)
    assert(members.forall(f.mightContain), "a member probed false")
    val nonMembers = (0L until 100000L).map(i => i * 0x9e3779b97f4a7c15L + 1)
    val fp = nonMembers.count(f.mightContain)
    // design fpp ≈ 0.8% at 10 bits/key, k=7; allow 3x slack
    assert(fp < 2500, s"$fp false positives in 100k probes")
    assert(f.loadFactor > 0.2 && f.loadFactor < 0.6, s"load=${f.loadFactor}")
  }

  test("distributed build equals the local build bit-for-bit") {
    val keys = (0L until 5000L).map(i => i * 0x517cc1b727220a95L)
    val local = Bloom.empty(5000)
    keys.foreach(local.set)
    val dist = Bloom.build(keys.toDF("h").repartition(7), col("h"), 5000)
    assert(dist.k === local.k)
    assert(java.util.Arrays.equals(dist.bits, local.bits))
  }

  test("mightContain column matches the scala probe, compiled and interpreted") {
    val f = Bloom.empty(1000)
    (0L until 1000L).map(i => i * 31L).foreach(f.set)
    val probes = (0L until 4000L).map(i => i * 7L)
    val got = probes.toDF("h")
      .select(col("h"), Bloom.mightContain(f, col("h")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach { h =>
      assert(got(h) === f.mightContain(h), s"h=$h")
    }
    // null hash -> null result
    val nullRow = Seq[Option[Long]](None).toDF("h")
      .select(Bloom.mightContain(f, col("h"))).head()
    assert(nullRow.isNullAt(0))
  }

  test("bloom-prefiltered contamination equals the exact operator") {
    val docs = (1L to 60L).map { i =>
      val base = (0 until 12).map(j => s"w${(i * 17 + j * 13) % 40}").mkString(" ")
      // every 6th document shares the benchmark's leading 8 words
      val t = if (i % 6 == 0) "b0 b1 b2 b3 b4 b5 b6 b7 " + base else base
      (i, t)
    }.toDF("doc_id", "text")
    val isBench = col("doc_id") === 6 // one benchmark doc
    val exact = Dedup.ngramContamination(docs, "doc_id", "text", isBench, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val bloomed = Dedup.ngramContaminationBloom(
        docs, "doc_id", "text", isBench, 8, expectedBenchGrams = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(bloomed === exact)
    assert(bloomed.exists(_._3), "planted contamination not found")
  }
}
