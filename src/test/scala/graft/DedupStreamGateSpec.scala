package graft

import java.nio.file.Files

import graft.operators.Dedup

/** The streaming near-dup admission gate: batch/stream parity,
  * first-matching-band dedup, and statelessness of the plan. */
class DedupStreamGateSpec extends SparkSpec {
  import spark.implicits._

  test("gate emits each pair once (both orientations) and runs stateless") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words about completely other things entirely"),
      (4L, "numbers one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val index = Dedup.corpusBandIndex(docs, "doc_id", "text")

    // batch mode: identical docs 1/2 collide in ALL 16 bands, yet the
    // first-matching-band filter emits each orientation exactly once
    val batch = Dedup.nearDupsAgainstIndex(docs, index, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(batch.length === 2, s"expected 2 rows, got ${batch.toSeq}")
    assert(batch.toSet === Set((1L, 2L, 1.0), (2L, 1L, 1.0)))

    // stream mode: same operator over a file stream — same rows, and
    // the query must run with NO state store (stream-static join +
    // per-row columns only)
    val dir = Files.createTempDirectory("graft_gate_docs")
    docs.coalesce(1).write.parquet(dir.resolve("b0").toString)
    val stream = spark.readStream.schema(docs.schema)
      .parquet(dir.toString + "/*/")
    val q = Dedup.nearDupsAgainstIndex(stream, index, "doc_id", "text")
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("gate_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 2)
    assert(got.toSet === batch.toSet)
    val stateOps = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
    assert(stateOps.forall(_.numRowsTotal == 0),
      s"gate must be stateless: $stateOps")
  }
}
