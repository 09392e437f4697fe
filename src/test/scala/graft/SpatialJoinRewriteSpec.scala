package graft

import org.apache.spark.sql.functions._

import graft.geom.st
import graft.operators.SpatialJoin
import graft.plans.SpatialJoinRewrite

/** The optimizer rule: a bare st_intersects join plans as a hash
  * equi-join on buckets instead of a BroadcastNestedLoopJoin, with
  * identical results to the hand-built SpatialJoin API. */
class SpatialJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SpatialJoinRewrite
  }

  private def boxesA = (0 until 30).map(i =>
    (i.toLong, i % 6 * 2.0, i / 6 * 2.0)).toDF("aid", "ax", "ay")
    .select($"aid", st.makeBox($"ax", $"ay", $"ax" + 2.5, $"ay" + 2.5).as("ga"))
  private def boxesB = (0 until 20).map(i =>
    (100L + i, i % 5 * 3.0 + 1.0, i / 5 * 3.0 + 1.0)).toDF("bid", "bx0", "by0")
    .select($"bid", st.makeBox($"bx0", $"by0", $"bx0" + 1.5, $"by0" + 1.5).as("gb"))

  test("st_intersects join is rewritten to a bucketed equi-join") {
    val j = boxesA.join(boxesB, st.intersects($"ga", $"gb"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"nested-loop join survived the rewrite:\n$plan")
    assert(plan.contains("Generate"), "bucket explode missing from plan")

    val viaRule = j.select("aid", "bid").as[(Long, Long)].collect().toSet
    val viaApi = SpatialJoin.join(boxesA, boxesB, "ga", "gb", 1.0,
      (l, r) => st.intersects(l, r))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(viaRule == viaApi)
    assert(viaRule.nonEmpty)
  }

  test("each qualifying pair appears exactly once (reference-point dedup)") {
    val j = boxesA.join(boxesB, st.intersects($"ga", $"gb"))
      .groupBy("aid", "bid").count()
    assert(j.filter($"count" > 1).count() == 0)
  }

  test("ordinary equi-joins are untouched") {
    val l = Seq((1L, "a"), (2L, "b")).toDF("k", "v1")
    val r = Seq((1L, "x"), (3L, "y")).toDF("k", "v2")
    val j = l.join(r, "k")
    assert(!j.queryExecution.optimizedPlan.toString.contains("__bucket"))
    assert(j.count() == 1)
  }

  test("conjunction conditions rewrite, carrying the rest into the refine") {
    val j = boxesA.join(boxesB,
      st.intersects($"ga", $"gb") && $"aid" < 10 && $"bid" =!= 105L)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"nested-loop join survived the conjunction rewrite:\n$plan")
    val viaRule = j.select("aid", "bid").as[(Long, Long)].collect().toSet
    val viaApi = SpatialJoin.join(
      boxesA.filter($"aid" < 10), boxesB.filter($"bid" =!= 105L),
      "ga", "gb", 1.0, (l, r) => st.intersects(l, r))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(viaRule == viaApi)
    assert(viaRule.nonEmpty)
  }

  test("equi+spatial conjunction joins keep the hash join on the key") {
    // When the condition carries a selective equi conjunct, Catalyst's
    // stock plan (hash join on the key, spatial predicate as join
    // filter) beats the bucket-explode rewrite (which replicates rows
    // per covering cell and joins on the less-selective bucket key) —
    // the rule must leave the join untouched.
    val l = boxesA.withColumn("k", $"aid" % 7)
    val r = boxesB.withColumn("k", $"bid" % 7)
    val j = l.join(r, l("k") === r("k") && st.intersects($"ga", $"gb"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("__bucket"), s"bucket rewrite hijacked an equi join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash/sort-merge join on the equi key:\n$plan")
    // and the results are the brute-force truth
    val got = j.select("aid", "bid").as[(Long, Long)].collect().toSet
    val truth = boxesA.crossJoin(boxesB)
      .filter(($"aid" % 7 === $"bid" % 7) && st.intersects($"ga", $"gb"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got == truth)
    assert(got.nonEmpty)
    // the spatial-only shape still rewrites (no nested loop) in the
    // same session — the bail-out is per-join, not global
    val spatialOnly = boxesA.join(boxesB, st.intersects($"ga", $"gb"))
    val p2 = spatialOnly.queryExecution.executedPlan.toString
    assert(!p2.contains("BroadcastNestedLoop") && !p2.contains("CartesianProduct"))
  }

  test("st_contains / st_within joins rewrite to bucketed equi-joins") {
    // big A boxes containing small B boxes
    val contains = boxesA.join(boxesB, st.contains($"ga", $"gb"))
    val withinSwapped = boxesA.join(boxesB, st.within($"gb", $"ga"))
    for (j <- Seq(contains, withinSwapped)) {
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
        s"nested-loop join survived the contains/within rewrite:\n$plan")
    }
    val gotContains = contains.select("aid", "bid")
      .as[(Long, Long)].collect().toSet
    val gotWithin = withinSwapped.select("aid", "bid")
      .as[(Long, Long)].collect().toSet
    // within(b, a) ⇔ contains(a, b)
    assert(gotContains == gotWithin)
    // brute-force truth over collected geometries
    val as = boxesA.select($"aid", st.xmin($"ga"), st.ymin($"ga"),
      st.xmax($"ga"), st.ymax($"ga"))
      .as[(Long, Double, Double, Double, Double)].collect()
    val bs = boxesB.select($"bid", st.xmin($"gb"), st.ymin($"gb"),
      st.xmax($"gb"), st.ymax($"gb"))
      .as[(Long, Double, Double, Double, Double)].collect()
    val brute = (for {
      (aid, ax0, ay0, ax1, ay1) <- as
      (bid, bx0, by0, bx1, by1) <- bs
      if bx0 >= ax0 && by0 >= ay0 && bx1 <= ax1 && by1 <= ay1
    } yield (aid, bid)).toSet
    assert(gotContains == brute)
    assert(gotContains.nonEmpty)
  }
}
