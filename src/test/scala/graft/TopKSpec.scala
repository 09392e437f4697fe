package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Bounded-heap top-k aggregate: ordering, ties, partial-aggregation
  * merge, and k > group size. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("top-k orders by score desc with id asc tie-break") {
    val df = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9),
      (1L, 13L, 0.1), (1L, 14L, 0.7)
    ).toDF("query_id", "neighbor_id", "cos_sim")
    val got = df.groupBy("query_id")
      .agg(Ann.topK($"cos_sim", $"neighbor_id", 3).as("top"))
      .select(posexplode($"top"))
      .select($"pos", $"col.neighbor_id", $"col.cos_sim")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == Seq((0, 11L, 0.9), (1, 12L, 0.9), (2, 14L, 0.7)))
  }

  test("partial aggregation across many partitions matches single-partition") {
    val rows = (0 until 1000).map(i => (i % 7L, i.toLong, (i * 37 % 101) / 101.0))
    val a = rows.toDF("q", "id", "s").repartition(13)
      .groupBy("q").agg(Ann.topK($"s", $"id", 5).as("t"))
      .select($"q", $"t").as[(Long, Seq[(Long, Double)])].collect().toMap
    val b = rows.toDF("q", "id", "s").coalesce(1)
      .groupBy("q").agg(Ann.topK($"s", $"id", 5).as("t"))
      .select($"q", $"t").as[(Long, Seq[(Long, Double)])].collect().toMap
    assert(a == b)
    assert(a.values.forall(_.length == 5))
  }

  test("k larger than the group returns the whole group, ordered") {
    val df = Seq((1L, 10L, 0.3), (1L, 11L, 0.8)).toDF("q", "id", "s")
    val got = df.groupBy("q").agg(Ann.topK($"s", $"id", 10).as("t"))
      .select(size($"t")).as[Int].head()
    assert(got == 2)
  }
}
