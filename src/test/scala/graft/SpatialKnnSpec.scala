package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.geom.st
import graft.operators.SpatialKnn

/** Bucketed ring-search kNN vs the brute-force cross-join oracle:
  * same neighbors, same rank order, same tie-breaks, across cell sizes
  * that force anything from one round to many ring expansions. */
class SpatialKnnSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: Seq[(Long, Double, Double)]): DataFrame =
    rows.toDF("pid", "x", "y").select($"pid", st.point($"x", $"y").as("pg"))

  private def ctrs(rows: Seq[(Long, Double, Double)]): DataFrame =
    rows.toDF("cid", "x", "y").select($"cid", st.point($"x", $"y").as("cg"))

  /** Exact oracle: score every pair, rank by (dist, cid). */
  private def brute(p: DataFrame, c: DataFrame, k: Int): Seq[(Long, Int, Long, Double)] = {
    val dx = st.stx($"pg") - st.stx($"cg")
    val dy = st.sty($"pg") - st.sty($"cg")
    p.crossJoin(c)
      .select($"pid", $"cid", sqrt(dx * dx + dy * dy).as("dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("pid").orderBy($"dist", $"cid")))
      .filter($"rank" <= k)
      .select($"pid", $"rank", $"cid", $"dist")
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
  }

  private def ring(p: DataFrame, c: DataFrame, k: Int, cell: Double): Seq[(Long, Int, Long, Double)] =
    SpatialKnn.knn(p, "pid", "pg", c, "cid", "cg", k, cell)
      .select($"pid", $"rank".cast("int"), $"cid", $"dist")
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted

  private val rnd = new scala.util.Random(42)
  private val randomCenters = (0L until 60L).map(i =>
    (i, rnd.nextDouble() * 50, rnd.nextDouble() * 40))
  private val randomPoints = (0L until 80L).map(i =>
    (i, rnd.nextDouble() * 70 - 10, rnd.nextDouble() * 60 - 10))

  test("matches brute force on random points across cell sizes") {
    val p = pts(randomPoints); val c = ctrs(randomCenters)
    val want = brute(p, c, 3)
    // 20.0 resolves most points in round one; 0.5 needs many ring
    // expansions (empty rings around outliers)
    Seq(20.0, 4.0, 0.5).foreach { cell =>
      assert(ring(p, c, 3, cell) == want, s"cellSize=$cell")
    }
  }

  test("equidistant centers break ties toward the smaller id") {
    val p = pts(Seq((1L, 1.0, 0.0)))
    val c = ctrs(Seq((9L, 2.0, 0.0), (4L, 0.0, 0.0), (7L, 1.0, 1.0)))
    // all three centers at distance exactly 1.0
    assert(ring(p, c, 2, 3.0).map(t => (t._2, t._3)) == Seq((1, 4), (2, 7)))
  }

  test("k larger than the center count returns every center once") {
    val p = pts(randomPoints.take(10))
    val c = ctrs(randomCenters.take(3))
    val got = ring(p, c, 5, 2.0)
    assert(got.map(_._1).distinct.size == 10)
    assert(got.size == 30) // 10 points × all 3 centers
    assert(got == brute(p, c, 5))
  }

  test("far outlier point converges through ring doubling") {
    val p = pts(Seq((1L, 500.0, 500.0)))
    val c = ctrs(randomCenters)
    assert(ring(p, c, 1, 1.0) == brute(p, c, 1))
  }

  test("empty points frame yields an empty, well-typed result") {
    val p = pts(Nil)
    val c = ctrs(randomCenters.take(3))
    val out = SpatialKnn.knn(p, "pid", "pg", c, "cid", "cg", 1, 1.0)
    assert(out.columns.toSeq == Seq("pid", "rank", "cid", "dist"))
    assert(out.count() == 0)
  }

  test("non-convergence inside maxRounds fails loudly") {
    val p = pts(Seq((1L, 1e7, 1e7)))
    val c = ctrs(Seq((1L, 0.0, 0.0)))
    val e = intercept[IllegalArgumentException] {
      SpatialKnn.knn(p, "pid", "pg", c, "cid", "cg", 1, 0.001, maxRounds = 4)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
