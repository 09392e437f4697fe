package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B attributing the r16 bench-pool readings of
  * the Int128Sum consumer queries (q7/q9/q17/q22 read −10…−24% vs their
  * r15 floors in r16's membw-degraded sweeps — VERDICT r16 Next #3:
  * "plausible-noise, not proven-noise"): alternate each query between
  * its declared form and the pre-r16 decimal(38,0) sum via the
  * `graft.exactDecimalSum` construction-time switch. If the DECIMAL
  * form is not faster in paired reps, the Int128Sum swap is not the
  * cause of the pool readings and they are box-mode noise.
  *
  * q1_pricing_summary rides along as the positive control: its r16
  * floor moved −43% on this exact swap, so the A/B must show the
  * int128 form clearly winning there for the method to be credible.
  *
  * Run: `sbt "runMain graft.tools.ExactSumAb [reps] [names...]"`.
  */
object ExactSumAb {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q7_volume_shipping", "q9_profit_nation",
        "q17_small_quantity", "q22_global_sales", "q1_pricing_summary")
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

    def time(name: String, decimal: Boolean): Double = {
      sys.props("graft.exactDecimalSum") = decimal.toString
      try {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally sys.props.remove("graft.exactDecimalSum")
    }

    names.foreach { name =>
      time(name, decimal = true); time(name, decimal = false) // JIT warmup
      val dec = collection.mutable.ArrayBuffer[Double]()
      val i128 = collection.mutable.ArrayBuffer[Double]()
      (0 until reps).foreach { _ =>
        dec += time(name, decimal = true)
        i128 += time(name, decimal = false)
      }
      def s(xs: Seq[Double]) =
        f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
      val wins = dec.zip(i128).count { case (d, n) => n <= d }
      println(s"[exactsum_ab] $name DECIMAL ${s(dec.toSeq)}  " +
        s"INT128 ${s(i128.toSeq)}  int128_wins=$wins/$reps")
    }
    spark.stop()
  }
}
