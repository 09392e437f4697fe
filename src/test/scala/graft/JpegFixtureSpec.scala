package graft

/** Keeps the checked-in `mm_jpeg_decode` golden fixture
  * (`src/test/resources/fixtures/jpeg_expected.parquet`, written by
  * [[graft.tools.GenJpegFixture]]) in lock-step with the live decoder:
  * the driver's per-round gate compares the query against this parquet
  * via DuckDB, so a decoder change that isn't re-pinned would surface
  * there first — this spec surfaces it at `sbt test` time instead,
  * with a pointer to the regeneration command. */
class JpegFixtureSpec extends SparkSpec {

  test("live mm_jpeg_decode output matches the checked-in golden fixture") {
    val path = "src/test/resources/fixtures/jpeg_expected.parquet"
    assert(new java.io.File(path).isFile, s"$path missing — run " +
      "`sbt \"runMain graft.tools.GenJpegFixture\"`")
    val live = graft.queries.MultimodalQueries.qMmJpegDecode(spark, "")
      .collect().map(_.toSeq).toSeq
    val pinned = spark.read.parquet(path)
      .orderBy("file").collect().map(_.toSeq).toSeq
    assert(live == pinned,
      "decoder output drifted from the golden fixture — if the change " +
        "is deliberate, regenerate with " +
        "`sbt \"runMain graft.tools.GenJpegFixture\"`")
  }
}
