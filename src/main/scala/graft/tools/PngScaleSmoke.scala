package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PngScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val t0 = System.nanoTime()
    val tiles = spark.range(rows)
      .select(col("id"), transform(sequence(lit(0), lit(255)),
        i => pmod(hash(col("id"), i), lit(256))).as("px"))
    val png = Bridge.column(graft.expressions.PngEncode(Seq(
      Bridge.expression(lit(16)), Bridge.expression(lit(16)),
      Bridge.expression(lit(1)), Bridge.expression(col("px")))))
    val dec = Bridge.column(graft.expressions.TryPngDecode(
      Seq(Bridge.expression(png))))
    val r = tiles.select(col("id"), col("px"), dec.as("dec"))
      .select(col("dec").isNotNull.cast("long").as("ok"),
        aggregate(col("dec.pixels"), lit(0L), (a, x) => a + x).as("s1"),
        aggregate(col("px"), lit(0L), (a, x) => a + x).as("s0"))
      .agg(sum("ok"), sum("s1"), sum("s0"))
      .as[(Long, Long, Long)].head()
    println(s"rows=$rows ok=${r._1} sumsMatch=${r._2 == r._3} sec=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
