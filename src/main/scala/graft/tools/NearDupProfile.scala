package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** Sub-stage profiler for the 10M-doc near-dup long pole found by
  * [[Prep10M]] (439 s in one `minhashNearDups` call): times the
  * pipeline's internal stages separately — shingle-set materialize,
  * banded LSH candidate generation, exact-Jaccard refine — on the same
  * 9M-survivor corpus, so the fix targets the measured cost, not the
  * suspected one. Prints one JSON line.
  */
object NearDupProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // same corpus as Prep10M after exact dedup: 9M survivors
    val docsN = 10000000L
    val survivors = CliqueCorpus.docs(
      spark.range(docsN).filter(col("id") % 10 =!= 9).toDF("id"))

    // PRE-HASHED sets — the representation minhashNearDups caches
    // (sorted xxhash64 longs feeding both banding and refine)
    val sets = survivors.select(col("id"),
        Dedup.hashedShingles(col("text"), 3).as("shh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nSets, tSets) = timed(sets.count())

    // candidates generated FROM THE PERSISTED SETS (the code-review
    // catch: minhashCandidates(survivors,...) would rebuild shingles
    // from raw text, double-counting the cost sets_sec already timed
    // and overstating the LSH stage)
    val cand = Dedup.minhashCandidatesFromHashedSets(sets, k = 32, bands = 16,
        maxBucket = 64)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nCand, tCand) = timed(cand.count())

    val (nRefined, tRefine) = timed {
      Dedup.refineJaccardHashed(cand, sets, 0.5).count()
    }

    println(s"""{"metric":"neardup_profile","sets":$nSets,""" +
      s""""sets_sec":$tSets,"cand":$nCand,"cand_sec":$tCand,""" +
      s""""refined":$nRefined,"refine_sec":$tRefine}""")
    spark.stop()
  }
}
