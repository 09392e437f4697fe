package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch perceptron TRAINER over integer features — the training
  * counterpart of [[Scoring.linearScore]] (which applies a weight
  * vector someone else produced; this produces it, e.g. a quality /
  * spam classifier learned from a labeled seed set).
  *
  * Classic batch perceptron, all-integer so the trajectory is exactly
  * engine-reproducible (no float summation order effects): per round,
  * every example with `y · (w·x + b) ≤ 0` is misclassified, and the
  * round's update is the SUM of `y·x` over the misclassified set —
  * one aggregate, applied once (deterministic, unlike per-example SGD
  * whose result depends on row order, which no distributed engine
  * should promise).
  *
  * Shape at 100 TB: features project map-side ONCE into a persisted
  * compact frame (one long per feature — the text never survives the
  * projection); each round is then a single partial-aggregated pass
  * over that frame collecting ONE driver row (the update vector),
  * mirroring the per-iteration discipline of [[PageRank]] and
  * [[BpeTrain]]. k rounds = k scans of the feature frame, zero
  * shuffles beyond the 1-row aggregate.
  */
object Perceptron {

  /** Train `rounds` batch-perceptron rounds on `df` with ±1 integer
    * label `labelCol` and integer feature columns `featureCols` (a
    * constant-1 bias feature is appended). Returns one row per
    * (round, feature): the weight AFTER the round's update and the
    * round's misclassified count. */
  def train(df: DataFrame, labelCol: String, featureCols: Seq[String],
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds")
    val spark = df.sparkSession
    import spark.implicits._
    val feats = featureCols :+ "bias"
    val data = df.select(
      (col(labelCol).cast("long").as("y") +:
        featureCols.map(c => col(c).cast("long").as(c))): _*)
      .withColumn("bias", lit(1L))
      .persist()
    try {
      data.count() // materialize once before the round scans
      val w = Array.fill(feats.size)(0L)
      val hist = ArrayBuffer.empty[(Long, String, Long, Long)]
      for (r <- 0 until rounds) {
        val dot = feats.zip(w).map { case (c, wi) => col(c) * lit(wi) }
          .reduce(_ + _)
        val mis = (col("y") * dot) <= 0
        val aggs = count(when(mis, 1)).as("n") +:
          feats.map(c =>
            sum(when(mis, col("y") * col(c)).otherwise(0L)).as(s"u_$c"))
        val row = data.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getLong(0)
        feats.indices.foreach { i =>
          w(i) += (if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1))
        }
        feats.zipWithIndex.foreach { case (c, i) =>
          hist += ((r.toLong, c, w(i), n))
        }
      }
      hist.toSeq.toDF("round", "feature", "weight", "n_mistakes")
        .orderBy("round", "feature")
    } finally { data.unpersist(); () }
  }
}
