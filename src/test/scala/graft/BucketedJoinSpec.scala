package graft

import org.apache.spark.sql.functions._

/** Bucketing for co-located joins (SURVEY §4 / the brief's "bucketing
  * for co-located joins"): both sides bucketed on the join key join
  * WITHOUT a shuffle exchange — at 100 TB this removes the dominant
  * cost of every fact-fact join that repeats across a pipeline. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("term-bucketed inverted index: postings join df shuffle-free, lookups prune") {
    // Scoring.bm25's scaladoc names the standing-index alternative to
    // its ad-hoc single-pass: persist the (term, doc_id, tf) postings
    // and the (term, df) frame bucketed by term. Prove the claim: the
    // postings⋈df join runs with ZERO exchange and a query-term lookup
    // is a pushed filter, never a scan-everything.
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val tf = docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    spark.sql("DROP TABLE IF EXISTS tf_b")
    spark.sql("DROP TABLE IF EXISTS df_b")
    tf.write.bucketBy(8, "term").sortBy("term")
      .mode("overwrite").saveAsTable("tf_b")
    tf.groupBy("term").agg(count(lit(1)).as("df"))
      .write.bucketBy(8, "term").sortBy("term")
      .mode("overwrite").saveAsTable("df_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val postings = spark.table("tf_b")
        .filter(col("term").isin("spark", "merge", "window"))
      val j = postings.join(spark.table("df_b"), "term")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"term-bucketed index join should not shuffle:\n$plan")
      assert(plan.contains("PushedFilters: [In(term"),
        s"term lookup not pushed into the scan:\n$plan")
      // scores equal the ad-hoc operator's for the same terms
      val viaIndex = j.select("doc_id", "term", "tf", "df").count()
      val direct = tf.filter(col("term").isin("spark", "merge", "window")).count()
      assert(viaIndex == direct && direct > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS tf_b")
      spark.sql("DROP TABLE IF EXISTS df_b")
    }
  }

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
