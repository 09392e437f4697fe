package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.util.Exact

/** Int128SumProduct must equal
  * sum(cast(x as decimal(38,0)) * cast(y as decimal(38,0))) — including
  * products past 2^63 that a single long cannot hold and the carry
  * paths of the 128-bit accumulator — and the rewired Stats.groupedOls
  * must equal its former all-decimal formulation bit-for-bit (it feeds
  * the hash-compared a_ols_trend oracle query).
  */
class Int128SumProductSpec extends SparkSpec {

  import spark.implicits._

  private def decSumProd(x: Column, y: Column): Column =
    sum(x.cast("decimal(38,0)") * y.cast("decimal(38,0)"))

  test("matches the decimal sum-of-products on random signed longs") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 20000).map { i =>
      // products up to ~2^84, sums wander across the 2^63 carry line
      (i % 37, rnd.nextLong() / (1L << 21), rnd.nextLong() / (1L << 21))
    }
    val df = rows.toDF("g", "x", "y").repartition(8)
    val both = df.groupBy("g")
      .agg(Exact.int128SumProduct(col("x"), col("y")).as("got"),
        decSumProd(col("x"), col("y")).as("exp"))
      .filter(col("got") =!= col("exp") ||
        col("got").isNull =!= col("exp").isNull)
    assert(both.count() == 0)
  }

  test("single-row products past 2^63 and extreme-magnitude inputs") {
    val cases = Seq(
      (Long.MaxValue, Long.MaxValue),
      (Long.MinValue, Long.MinValue),
      (Long.MinValue, Long.MaxValue),
      (Long.MaxValue, -3L),
      ((1L << 62), 4L),
      (-(1L << 62), 4L),
      (0L, Long.MinValue),
      (1L, -1L))
    cases.foreach { case (x, y) =>
      val got = Seq((x, y)).toDF("x", "y")
        .agg(Exact.int128SumProduct(col("x"), col("y")).cast("string"))
        .head().getString(0)
      assert(BigInt(got) == BigInt(x) * BigInt(y), s"case ($x, $y)")
    }
    // and a sum OF such products, accumulated across partitions
    val vs = (0 until 4000).map(i =>
      if (i % 2 == 0) ((1L << 60), 9L) else (-(1L << 60), 5L))
    val expect = vs.map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    val got = vs.toDF("x", "y").repartition(16)
      .agg(Exact.int128SumProduct(col("x"), col("y")).cast("string"))
      .head().getString(0)
    assert(BigInt(got) == expect)
  }

  test("a null on either side skips the row, like the decimal multiply") {
    val df = Seq[(Int, java.lang.Long, java.lang.Long)](
      (1, 5L, 3L), (1, null, 7L), (1, 11L, null),
      (2, null, null), (2, null, 1L), (3, -7L, 2L))
      .toDF("g", "x", "y")
    val got = df.groupBy("g")
      .agg(Exact.int128SumProduct(col("x"), col("y")).as("got"),
        decSumProd(col("x"), col("y")).as("exp"))
      .orderBy("g").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"group ${r.getInt(0)}")
      if (!r.isNullAt(1))
        assert(r.getDecimal(1).compareTo(r.getDecimal(2)) == 0)
    }
    val empty = spark.range(0)
      .agg(Exact.int128SumProduct(col("id"), col("id"))).head()
    assert(empty.isNullAt(0))
  }

  /** groupedOls's former all-decimal aggregation, kept as the parity
    * reference for the rewired 128-bit form. */
  private def oldGroupedOls(df: org.apache.spark.sql.DataFrame,
      keys: Seq[String], xCol: String, yCol: String)
      : org.apache.spark.sql.DataFrame = {
    val dec = "decimal(38,0)"
    val x = col(xCol).cast(dec)
    val y = col(yCol).cast(dec)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(keys.map(col) ++ Seq(
        col("n").cast("long").as("n"),
        expr("(num * 1000000) div nullif(den, 0)").as("slope_ppm"),
        expr("((sy * den - num * sx) * 1000000) div nullif(n * den, 0)")
          .as("icept_ppm")): _*)
  }

  test("groupedOls equals its former decimal form on real data") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val pts = orders.select(
      to_date(date_trunc("month", col("o_orderdate"))).as("mon"),
      dayofmonth(col("o_orderdate")).cast("long").as("x"),
      round(col("o_totalprice") * 100).cast("long").as("y"))
    val now = graft.operators.Stats.groupedOls(pts, Seq("mon"), "x", "y")
    val old = oldGroupedOls(pts, Seq("mon"), "x", "y")
    assert(now.schema == old.schema)
    assert(now.exceptAll(old).count() == 0 && old.exceptAll(now).count() == 0)
    assert(now.count() == old.count() && now.count() > 0)
  }
}
