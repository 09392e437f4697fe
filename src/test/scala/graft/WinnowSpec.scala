package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.expressions.{LongArraySum, WinnowFingerprints}

/** WinnowFingerprints (single compiled pass) must equal the reference
  * Column formulation — explode one row per gram position, windowed
  * min, distinct — on every text-length regime: shorter than k, between
  * k and k+w, long, empty, and repetitive (duplicate minima). */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8
  private val w = 8

  private def referenceFps(texts: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    import org.apache.spark.sql.expressions.Window
    val d = texts.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .withColumn("m", greatest(col("n") - (k - 1), lit(1)))
    val grams = d
      .select(col("doc_id"), col("m"),
        explode(sequence(lit(1), col("m"))).as("i"), col("text"))
      .select(col("doc_id"), col("m"), col("i"),
        conv(substring(md5(substring(col("text"), col("i"), lit(k))), 1, 12), 16, 10)
          .cast("long").as("h"))
    val win = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min("h").over(win))
      .filter(col("i") <= greatest(col("m") - (w - 1), lit(1)))
      .select("doc_id", "fp").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, fs) => id -> fs.map(_._2).toSet }
  }

  private def winnowed(texts: Seq[(Long, String)]): Map[Long, Seq[Long]] =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), Bridge.column(WinnowFingerprints(
        Seq(Bridge.expression(col("text"))), k, w)).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap

  test("single-pass winnowing equals the explode+window formulation") {
    val texts = Seq(
      0L -> "the quick brown fox jumps over the lazy dog again and again and again",
      1L -> "", // md5 of the empty gram
      2L -> "short", // |text| < k: one truncated gram
      3L -> "exactly8", // |text| == k
      4L -> "twelve chars", // k < |text| < k + w: one truncated window
      5L -> ("ab" * 200), // repetitive: heavy duplicate minima
      6L -> "aaaaaaaaaaaaaaaaaaaaaaaa") // constant hash stream
    val want = referenceFps(texts)
    val got = winnowed(texts)
    assert(got.keySet == want.keySet)
    for ((id, fps) <- got) {
      assert(fps.toSet == want(id), s"doc $id")
      assert(fps == fps.sorted, s"doc $id not ascending")
      assert(fps.distinct == fps, s"doc $id not distinct")
    }
  }

  test("LongArraySum sums long arrays") {
    val r = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq.empty[Long]))
      .toDF("id", "a")
      .select(col("id"), Bridge.column(LongArraySum(Seq(
        Bridge.expression(col("a"))))).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 6L, 2L -> 0L))
  }

  test("winnowing query plan has no Exchange before the output sort") {
    val q = graft.queries.TextQueries.queries("text_winnowing")
    val df = q(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // exactly one Exchange: the rangepartitioning for the final orderBy
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected only the output-sort Exchange:\n$plan")
  }
}
