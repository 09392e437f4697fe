package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.expressions.{GifEncode, GifFrames, GifFrameWeightedSums, ShiftTileFrames}

/** [[GifFrameWeightedSums]] — the compiled replacement for
  * mm_gif_frames' per-frame HOF weighted sums — must equal the HOF
  * formulation exactly on real encoded-then-decoded GIF frames, and
  * reject wrong input shapes at analysis time. */
class GifWsumSpec extends SparkSpec {

  private def framesCol(payload: org.apache.spark.sql.Column) = {
    val n = octet_length(payload)
    val w = (n % 16 + 1)
    val h = ((n + w - 1) / w).cast("int")
    val bytes = Bridge.column(graft.expressions.BytesToIntArray(Seq(
      Bridge.expression(payload.cast("binary")))))
    val fr = Bridge.column(ShiftTileFrames(Seq(
      Bridge.expression(bytes), Bridge.expression(w.cast("int")),
      Bridge.expression(h)), nFrames = 3))
    Bridge.column(GifFrames(Seq(Bridge.expression(Bridge.column(GifEncode(Seq(
      Bridge.expression(w.cast("int")), Bridge.expression(h),
      Bridge.expression(fr))))))))
  }

  test("compiled wsums equal the HOF formulation on real GIF frames") {
    import spark.implicits._
    val docs = Seq("hello gif world", "x", "a longer text payload 0123456789",
      "\u0000\u00ff binary-ish \u0080").toDF("text")
    val fr = framesCol(col("text"))
    val hofWsum = (f: org.apache.spark.sql.Column) =>
      aggregate(zip_with(f.getField("pixels"),
          sequence(lit(0), size(f.getField("pixels")) - 1),
          (px, i) => when(i % 3 === 0,
            (i / lit(3)).cast("long") * px).otherwise(lit(0L))),
        lit(0L), (a, x) => a + x)
    val both = docs.select(
      Bridge.column(GifFrameWeightedSums(
        Seq(Bridge.expression(fr)), k = 3)).as("fast"),
      array(hofWsum(get(fr, lit(0))), hofWsum(get(fr, lit(1))),
        hofWsum(get(fr, lit(2)))).as("slow"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("null frame elements contribute zero, not an NPE") {
    import spark.implicits._
    val fr = framesCol(col("text"))
    // same element type as GifFrames' output, every element null —
    // containsNull arrays pass the type check, so eval must tolerate
    // null structs (they count as zero, like an absent frame)
    val nulled = transform(fr, f => when(lit(false), f))
    val row = Seq("abc").toDF("text")
      .select(Bridge.column(GifFrameWeightedSums(
        Seq(Bridge.expression(nulled)), k = 3)).as("ws"))
      .head()
    assert(row.getSeq[Long](0) === Seq(0L, 0L, 0L))
  }

  test("null pixels value contributes zero, not an NPE") {
    import spark.implicits._
    // nullable struct FIELDS pass the type check (only the field's
    // dataType is compared), so eval must tolerate a null pixels
    // value — it counts as zero, like a null frame
    val frames = array(
      named_struct(lit("pixels"), when(lit(false), array(lit(1)))),
      named_struct(lit("pixels"), array(lit(10), lit(20), lit(30),
        lit(40), lit(50), lit(60))))
    val row = Seq(1).toDF("x")
      .select(Bridge.column(GifFrameWeightedSums(
        Seq(Bridge.expression(frames)), k = 2)).as("ws"))
      .head()
    // frame 1: sum p*px[3p] = 0*10 + 1*40 = 40
    assert(row.getSeq[Long](0) === Seq(0L, 40L))
  }

  test("trailing partial RGB group matches the HOF semantics") {
    import spark.implicits._
    // 7 elements = 2 full RGB groups + 1 trailing byte. The HOF form
    // included index i=3p for ANY i < len, so p=2 (i=6) contributes —
    // the compiled pass must agree, not drop the partial group.
    val px = array((1 to 7).map(i => lit(i * 10)): _*)
    val frames = array(named_struct(lit("pixels"), px))
    val row = Seq(1).toDF("x")
      .select(Bridge.column(GifFrameWeightedSums(
        Seq(Bridge.expression(frames)), k = 1)).as("ws"))
      .head()
    // 0*px[0] + 1*px[3] + 2*px[6] = 0*10 + 40 + 2*70 = 180
    assert(row.getSeq[Long](0) === Seq(180L))
  }

  test("null input yields null; wrong shape rejected at analysis time") {
    import spark.implicits._
    val fr = framesCol(col("text"))
    val row = Seq((null: String)).toDF("text")
      .select(Bridge.column(GifFrameWeightedSums(
        Seq(Bridge.expression(fr)), k = 2)).as("s"))
      .head()
    assert(row.isNullAt(0))
    val bad = intercept[Exception] {
      Seq(1).toDF("x").select(Bridge.column(GifFrameWeightedSums(
        Seq(Bridge.expression(array(lit(1)))), k = 2))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("gif_frame_wsums") ||
      bad.getMessage.toLowerCase.contains("datatype") ||
      bad.getMessage.toLowerCase.contains("data type"))
  }
}
