package graft

import graft.operators.Scoring

/** Hand-computed median/MAD gates, including the even-count
  * interpolation rule. */
class RobustOutliersSpec extends SparkSpec {

  import spark.implicits._

  test("odd group: median and MAD pick middle values exactly") {
    // values 10, 12, 14, 16, 100 → med 14, |dev| = 4,2,0,2,86 → mad 2;
    // keep iff |v−14| ≤ 6 → 100 is the only outlier
    val df = Seq(10L, 12L, 14L, 16L, 100L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "v")
    val got = Scoring.robustOutliers(df, "g", "v", 3.0)
      .select("id", "med", "mad", "keep_len")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(got.forall(r => r._2 == 14.0 && r._3 == 2.0))
    assert(got.map(_._4).toSeq === Seq(true, true, true, true, false))
  }

  test("even group interpolates (a+b)/2 for both medians") {
    // values 10, 20, 30, 100 → med 25; |dev| = 15,5,5,75 → mad 10;
    // keep iff |v−25| ≤ 30 → 100 out
    val df = Seq(10L, 20L, 30L, 100L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "v")
    val got = Scoring.robustOutliers(df, "g", "v", 3.0)
      .select("id", "med", "mad", "keep_len")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(got.forall(r => r._2 == 25.0 && r._3 == 10.0))
    assert(got.map(_._4).toSeq === Seq(true, true, true, false))
  }

  test("groups gate independently") {
    val df = (Seq((0L, "a", 5L), (1L, "a", 5L), (2L, "a", 500L)) ++
      Seq((3L, "b", 500L), (4L, "b", 500L), (5L, "b", 5L))).toDF("id", "g", "v")
    val keep = Scoring.robustOutliers(df, "g", "v", 3.0)
      .select("id", "keep_len").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keep === Map(0L -> true, 1L -> true, 2L -> false,
      3L -> true, 4L -> true, 5L -> false))
  }
}
