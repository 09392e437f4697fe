package graft

import graft.operators.Stats

/** Hand-computed checks for the grouped OLS aggregate. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("groupedOls recovers exact, fractional, and negative slopes") {
    // A: y = 2x exactly; B: slope 9/6 = 1.5, intercept -12/18 = -0.66…;
    // D: the line through (1,10),(2,8) is y = -2x + 12
    val pts = Seq(
      ("A", 1L, 2L), ("A", 2L, 4L), ("A", 3L, 6L),
      ("B", 1L, 1L), ("B", 2L, 2L), ("B", 3L, 4L),
      ("D", 1L, 10L), ("D", 2L, 8L)).toDF("k", "x", "y")
    val r = Stats.groupedOls(pts, Seq("k"), "x", "y")
      .orderBy("k").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r === Array(
      ("A", 3L, 2000000L, 0L),
      ("B", 3L, 1500000L, -666666L), // -12/18 ppm truncated toward zero
      ("D", 2L, -2000000L, 12000000L)))
  }

  test("groupedOls yields NULL for a zero-variance group") {
    // every x identical: den = n·Σx² − (Σx)² = 0, no line exists
    val pts = Seq(("C", 5L, 3L), ("C", 5L, 9L)).toDF("k", "x", "y")
    val row = Stats.groupedOls(pts, Seq("k"), "x", "y").collect()(0)
    assert(row.getLong(1) === 2L)
    assert(row.isNullAt(2) && row.isNullAt(3))
  }
}
