package graft

import graft.operators.{Merge, Sketches}

/** Hand-computed checks for the histogram quantile sketch and the
  * SCD2 history build. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("histogramQuantiles picks the first bin reaching q·total") {
    // 10 values in bins of width 10: bins 0..9, one value each
    val df = (0 until 10).map(i => i * 10 + 5.0).toDF("v")
    val r = Sketches.histogramQuantiles(df, "v", 10.0,
        Seq(100000L, 500000L, 1000000L))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // q=0.1: cum 1 ≥ 0.1·10 at bin 0; q=0.5: cum 5 ≥ 5 at bin 4;
    // q=1.0: cum 10 ≥ 10 at bin 9
    assert(r === Array((100000L, 0L, 0L), (500000L, 4L, 4000L),
      (1000000L, 9L, 9000L)))
  }

  test("histogramQuantiles handles skewed masses exactly") {
    // 99 values in bin 0, 1 value in bin 7
    val df = (Seq.fill(99)(3.0) ++ Seq(77.0)).toDF("v")
    val r = Sketches.histogramQuantiles(df, "v", 10.0,
        Seq(500000L, 990000L, 991000L))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // cum(bin0)=99 covers q up to 0.99; anything above needs bin 7
    assert(r === Array((500000L, 0L), (990000L, 0L), (991000L, 7L)))
  }

  test("histogram is a two-row frame for two occupied bins") {
    val df = Seq(1.0, 2.0, 15.0).toDF("v")
    val h = Sketches.histogram(df, "v", 10.0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(h === Map(0L -> 2L, 1L -> 1L))
  }

  test("scd2FromLog collapses consecutive repeats and versions the rest") {
    val log = Seq(
      (1L, "A", 1, 10), (1L, "A", 2, 11), (1L, "B", 3, 12),
      (1L, "A", 4, 13),
      (2L, "X", 1, 20)
    ).toDF("k", "attr", "t", "tid")
    val out = Merge.scd2FromLog(log, "k", "attr", Seq("t", "tid"))
      .select("k", "attr", "valid_from", "valid_to", "version_nr",
        "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), Option(r.get(3)).map(_.asInstanceOf[Int]),
        r.getInt(4), r.getBoolean(5))).sortBy(x => (x._1, x._5))
    assert(out === Array(
      (1L, "A", 1, Some(3), 1, false),   // A from t=1 (repeat at 2 folded)
      (1L, "B", 3, Some(4), 2, false),
      (1L, "A", 4, None, 3, true),       // back to A — a NEW version
      (2L, "X", 1, None, 1, true)))
  }

  test("scd2FromLog is a single-shuffle window plan") {
    val log = Seq((1L, "A", 1, 1)).toDF("k", "attr", "t", "tid")
    val plan = Merge.scd2FromLog(log, "k", "attr", Seq("t", "tid"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected one key shuffle, got:\n$plan")
  }
}
