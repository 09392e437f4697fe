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
  *
  * Heap floor: 8 GiB at the default 10M docs (`SPARK_DRIVER_MEM=8g`,
  * the build default). Unlike Prep10M — which passes its count gates
  * at 4 GiB — this tool deliberately persists the shingle sets AND the
  * candidate pairs AND replays every substage as a fresh action, so
  * its working set is a multiple of the pipeline's; running it at the
  * pipeline's 4 GiB rig OOMs by design, not by defect. Use
  * `SPARK_GRAFT_DOCS` to profile smaller corpora at smaller heaps.
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

    // same corpus as Prep10M after exact dedup: 9M survivors (docs
    // overridable for fast iteration on the substage numbers)
    val docsN = sys.env.getOrElse("SPARK_GRAFT_DOCS", "10000000").toLong
    val survivors = CliqueCorpus.docs(
      spark.range(docsN).filter(col("id") % 10 =!= 9).toDF("id"))

    // PRE-HASHED sets — the representation minhashNearDups caches
    // (sorted xxhash64 longs feeding both banding and refine)
    // MIRROR the pipeline's cache shape (repartitioned + sorted on id,
    // r15): refine_sec must measure the plan that ships — without
    // this the tool times two sets-side shuffles+sorts the production
    // refine no longer executes, and A/Bs based on it optimize a
    // phantom plan
    val setsP = org.apache.spark.sql.graftbridge.Bridge
      .numShufflePartitions(spark)
    val sets = survivors.select(col("id"),
        Dedup.hashedShingles(col("text"), 3).as("shh"))
      .repartition(setsP, col("id")).sortWithinPartitions("id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nSets, tSets) = timed(sets.count())

    // ---- candidate SUBSTAGES, each a fresh action over the cached
    // sets (so every number re-pays signature+explode — deltas between
    // them isolate the shuffle / guard / join / distinct increments)
    // (a) signature + band explode alone: no shuffle, pure compute
    val banded = Dedup.minhashBandedHashed(sets, 32, 16)
    val (nBanded, tBanded) = timed(banded.count())
    // (b) + the bucket-size window guard (shuffle + sort + filter)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("band_hash"))
    val guarded = banded.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") >= 2 && col("__n") <= 64).drop("__n")
    val (nGuarded, tGuarded) = timed(guarded.count())

    // candidates generated FROM THE PERSISTED SETS (the code-review
    // catch: minhashCandidates(survivors,...) would rebuild shingles
    // from raw text, double-counting the cost sets_sec already timed
    // and overstating the LSH stage)
    // construction INSIDE the timed block: pairsFromBuckets eagerly
    // materializes its guarded-membership cache at call time (the
    // partitioning-propagation contract), and that work belongs to
    // the candidate stage's number
    val ((cand, nCand), tCand) = timed {
      val c = Dedup.minhashCandidatesFromHashedSets(sets, k = 32,
          bands = 16, maxBucket = 64)
        .persist(StorageLevel.MEMORY_AND_DISK)
      (c, c.count())
    }

    // refine timed as best-of-N in THIS JVM: single trials on this box
    // spread 2-4x under neighbor contention (r14: untouched stages
    // moved 40%+ between back-to-back runs), and join-strategy A/Bs
    // need same-box-state minimums to mean anything
    val refineTrials = sys.env.getOrElse("SPARK_GRAFT_REFINE_TRIALS", "3").toInt
    val (nRefined, tRefine) = (1 to refineTrials).map { _ =>
      timed(Dedup.refineJaccardHashed(cand, sets, 0.5).count())
    }.minBy(_._2)

    println(s"""{"metric":"neardup_profile","docs":$docsN,"sets":$nSets,""" +
      s""""sets_sec":$tSets,"banded":$nBanded,"banded_sec":$tBanded,""" +
      s""""guarded":$nGuarded,"guarded_sec":$tGuarded,""" +
      s""""cand":$nCand,"cand_sec":$tCand,""" +
      s""""refined":$nRefined,"refine_sec":$tRefine}""")
    spark.stop()
  }
}
