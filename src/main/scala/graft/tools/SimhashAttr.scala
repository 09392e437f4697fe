package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Same-JVM stage attribution for dedup_simhash (VERDICT r16 Next #6):
  * the notes claim its ~1.9 s pool floor is OUTPUT-bound (~425 k true
  * pairs at sf0.1 plus the declared global orderBy). Decompose it:
  * fingerprints → band membership → bucket candidate pairs → hamming
  * refine → full query (refine + global sort), each noop-timed in one
  * session (the DistAttr pattern). If banding/probe is > 0.5 s, the
  * minhash-style bitmap prescreen applies; if the pair list dominates,
  * the floor is intrinsic output.
  *
  * Run: `sbt "runMain graft.tools.SimhashAttr"`.
  */
object SimhashAttr {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (maxDist, bits) = (3, 48)
    def docs = Tables(spark, dir, "documents")
    def fp = Dedup.simhashFingerprints(docs, "doc_id", "text", bits)
    def memb = {
      val bandCols = Dedup.hammingBands(bits, maxDist).zipWithIndex.map {
        case ((off, w), i) =>
          struct(lit(i).as("band"),
            shiftright(col("fp"), off).bitwiseAND((1L << w) - 1L).as("bval"))
      }
      fp.select(col("id"), explode(array(bandCols: _*)).as("b"))
        .select(col("id"), col("b.band").as("band"), col("b.bval").as("bval"))
    }
    def pairs = Dedup.simhashNearDups(docs, "doc_id", "text",
      maxDist = maxDist, bits = bits)
    def full = pairs.orderBy("id_a", "id_b")

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[simhash_attr] $tag: $s%.3f s"); s
    }
    time("warm full")(full)
    println(s"[simhash_attr] pairs_out=${pairs.count()}")
    (1 to 3).foreach { i =>
      time(s"fingerprints $i")(fp)
      time(s"band_membership $i")(memb)
      time(s"pairs_refined $i")(pairs)
      time(s"full_sorted $i")(full)
    }
    spark.stop()
  }
}
