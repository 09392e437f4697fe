package graft

import org.apache.spark.sql.functions._

/** Bucketing for co-located joins (SURVEY §4 / the brief's "bucketing
  * for co-located joins"): both sides bucketed on the join key join
  * WITHOUT a shuffle exchange — at 100 TB this removes the dominant
  * cost of every fact-fact join that repeats across a pipeline. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables sort-merge join with no shuffle exchange") {
    val ord = Tables(spark, "/root/testdata/sf0.001", "orders")
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("ord_b")
        .join(spark.table("li_b"), $"o_orderkey" === $"l_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // same result as the plain (shuffling) join
      val expected = ord.join(li, $"o_orderkey" === $"l_orderkey").count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.sql("DROP TABLE IF EXISTS li_b")
    }
  }
}
