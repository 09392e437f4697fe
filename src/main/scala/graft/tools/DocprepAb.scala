package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Same-JVM interleaved A/B for the r17 pipeline_docprep verdict-stage
  * fusion (VERDICT r16 Next #4): OLD = verdict joins flags against the
  * corpus-wide (quality ⋈ winners) intermediate; NEW = verdict joins
  * the compact winner frame directly, near-dup input via semi join.
  * Alternating reps in one session cancel the box's membw-mode drift —
  * the only trustworthy local evidence (tools/ContainAb precedent).
  *
  * Run: `sbt "runMain graft.tools.DocprepAb [reps]"`.
  */
object DocprepAb {

  private def flagsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      TextAnalysis.languageId(col("text")).as("lang_pred"),
      (TextAnalysis.tokenCount(col("text")) >= 20 &&
        TextAnalysis.stopwordCount(col("text")) >= 1).as("keep_quality"))

  /** The pre-r17 query shape, verbatim. */
  private def oldForm(spark: SparkSession, dir: String): DataFrame = {
    val flags = flagsOf(Tables(spark, dir, "documents"))
    val quality = flags.filter(col("keep_quality"))
    val winners = quality
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .groupBy("digest").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(true).as("keep_exact"))
    val exact = quality.select(col("doc_id"), col("text"))
      .join(winners, Seq("doc_id"), "left")
      .withColumn("keep_exact", coalesce(col("keep_exact"), lit(false)))
    val survivors = exact.filter(col("keep_exact"))
      .select(col("doc_id"), col("text"))
    val dupIds = Dedup.minhashNearDups(survivors, "doc_id", "text", 3, 0.5)
      .select(col("id_b").as("dup_id")).distinct()
    flags.select(col("doc_id"), col("lang_pred"), col("keep_quality"))
      .join(exact.select(col("doc_id"), col("keep_exact")), Seq("doc_id"), "left")
      .join(dupIds, col("doc_id") === col("dup_id"), "left")
      .select(col("doc_id"), col("lang_pred"), col("keep_quality"),
        coalesce(col("keep_exact"), lit(false)).as("keep_exact"),
        (coalesce(col("keep_exact"), lit(false)) && col("dup_id").isNull)
          .as("kept"))
      .orderBy("doc_id")
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String, df: => DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[docprep_ab] $tag: $dt%.3f s")
      dt
    }
    // one warmup each (JIT), then alternate
    time("warmup_old", oldForm(spark, sfDir))
    time("warmup_new", graft.SparkEntry.queries("pipeline_docprep")(spark, sfDir))
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    (0 until reps).foreach { _ =>
      olds += time("old", oldForm(spark, sfDir))
      news += time("new", graft.SparkEntry.queries("pipeline_docprep")(spark, sfDir))
    }
    def stats(xs: Seq[Double]) =
      f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"[docprep_ab] OLD ${stats(olds.toSeq)}  NEW ${stats(news.toSeq)}")
    spark.stop()
  }
}
