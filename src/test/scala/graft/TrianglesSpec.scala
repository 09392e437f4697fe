package graft

import graft.operators.Triangles

/** Hand-computed triangle counts: orientation, dedup, and the
  * zero-wedge star property. */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def counts(edges: Seq[(String, String)]): Map[String, Long] =
    Triangles.perNodeCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("two fused triangles count per node") {
    // ab, ac, bc, bd, cd: triangles abc and bcd
    val got = counts(Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d",
      "c" -> "d"))
    assert(got === Map("a" -> 1L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("duplicate, reversed, and self-loop edges collapse first") {
    val got = counts(Seq("a" -> "b", "b" -> "a", "a" -> "b", "a" -> "a",
      "a" -> "c", "c" -> "b"))
    assert(got === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("a star has no triangles and produces no wedge fan-out") {
    val star = (0 until 200).map(i => "hub" -> s"s$i")
    assert(counts(star) === Map.empty)
  }

  test("K4 yields four triangles, three per node") {
    val nodes = Seq("a", "b", "c", "d")
    val k4 = for (x <- nodes; y <- nodes if x < y) yield x -> y
    assert(counts(k4) === nodes.map(_ -> 3L).toMap)
  }
}
