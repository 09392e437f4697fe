package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF-PQ disk-served operating curve at the 10M-code scale point
  * (VERDICT r10 #7): the 1M curve measured serve times that were flat
  * in nprobe because the whole persisted code table fit one local scan
  * — the partition-pruning win was plan-pinned (`PqSpec`) but not
  * measured. At 10M codes on the cell-partitioned parquet layout the
  * probed-cell `isin` filter IS parquet partition pruning, so the
  * nprobe slope (and the pruned-read fraction) becomes measurable.
  * Prints one JSON line: build/save once, then per nprobe ∈ {1,2,4,8}
  * the disk-served recall@10 against the exact L2 ground truth and the
  * serve seconds. Same 100k-size near-dup-cluster corpus family as
  * ScaleBench stage 6d, 10 queries. */
object IvfPq10M {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-ivfpq-10m").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 64
    val rows = 10000000L
    val cid = col("id") % (rows / 10) // 1M clusters of 10 near-dups
    val vec = array((0 until dim).map { d =>
      ((hash(cid, lit(d)).cast("double") / 2147483647.0) +
        (hash(col("id"), lit(d + 1000)).cast("double") / 2147483647.0) * 0.1)
        .cast("float")
    }: _*)
    val corpus = spark.range(rows).select(col("id"), vec.as("embedding"))
      .persist()
    val queries = corpus.filter(col("id") % 1000000 === 7) // 10 queries

    val (idx, tBuild) = timed {
      val i = graft.operators.Ann.ivfPqBuild(corpus, "id", "embedding",
        nlist = 64, m = 8, codebookK = 64, lloydIters = 1)
      i.codes.persist().count()
      i
    }
    val dir = graft.util.Scratch.dir("ivfpq_10m").resolve("idx").toString
    val (_, tSave) = timed(graft.operators.Ann.ivfPqSaveIndex(idx, dir))
    idx.codes.unpersist()
    val loaded = graft.operators.Ann.ivfPqLoadIndex(spark, dir)

    val (exact, tExact) = timed {
      val e = graft.operators.Ann.l2TopK(corpus, queries,
          "id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id")).persist()
      e.count()
      e
    }
    val denom = exact.count().toDouble

    def servePoint(nprobe: Int): Double = {
      val got = graft.operators.Ann.ivfPqServeRerank(loaded, corpus,
          queries, "id", "embedding", 10, 20, nprobe)
        .select(col("query_id"), col("neighbor_id")).persist()
      val r = got.intersect(exact).count().toDouble / denom
      got.unpersist()
      r
    }
    // Global throwaway serve BEFORE the curve: the r11 run measured
    // nprobe=1 at 9.78 s vs the 3.6-3.8 s band of the later points —
    // the first curve point paid whole-JVM JIT/codegen bring-up that
    // its single same-point warm-up did not fully absorb. One full
    // serve at a genuinely OFF-curve nprobe (3 is not among the
    // measured {1,2,4,8}, so no measured point gets extra same-point
    // warmth) moves that cost off every measured point; each point is
    // then min-of-2 (the curve is a property of the plan, not of
    // transient machine state).
    servePoint(3)
    val points = Seq(1, 2, 4, 8).map { nprobe =>
      servePoint(nprobe) // warm-up: same-point page cache
      val (rec1, t1) = timed(servePoint(nprobe))
      val (rec2, t2) = timed(servePoint(nprobe))
      require(rec1 == rec2, s"serve not deterministic at nprobe=$nprobe")
      (nprobe, rec1, math.min(t1, t2))
    }
    require(points.last._2 >= points.head._2, s"curve inverted: $points")
    require(points.exists(_._2 >= 0.8), s"recall collapsed at 10M: $points")

    // the pruning win, measured directly on the partitioned layout:
    // scanning 10 of 64 cell directories (the worst case of a
    // 10-query nprobe=1 serve) vs the full code table
    val (nPruned, tPruned) = timed(
      loaded.codes.filter(col("cell") < 10).count())
    val (nFull, tFull) = timed(loaded.codes.count())

    println(s"""{"metric":"ivfpq_10m","rows":$rows,""" +
      s""""build_sec":$tBuild,"save_sec":$tSave,"exact_gt_sec":$tExact,""" +
      points.map { case (np, r, t) =>
        s""""nprobe_$np":{"recall_at_10":$r,"serve_sec":$t}"""
      }.mkString("", ",", ",") +
      s""""pruned_scan_rows":$nPruned,"pruned_scan_sec":$tPruned,""" +
      s""""full_scan_rows":$nFull,"full_scan_sec":$tFull}""")
    spark.stop()
  }
}
