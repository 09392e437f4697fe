package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.expressions.Int128Sum
import graft.util.Exact

/** Int128Sum must equal sum(cast(v as decimal(38,0))) — including the
  * carry paths a plain long sum would get wrong — and the rewired
  * Exact.fixedSum/fixedAvg must equal their former decimal
  * formulations bit-for-bit (they feed hash-compared oracle queries).
  */
class Int128SumSpec extends SparkSpec {

  import spark.implicits._

  private def i128(c: Column): Column =
    Bridge.column(Int128Sum(Bridge.expression(c)).toAggregateExpression())

  private def decSum(c: Column): Column =
    sum(c.cast("decimal(38,0)"))

  test("matches decimal sum on random signed longs across groups") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20000).map { i =>
      (i % 37, rnd.nextLong() / 1000) // /1000: sums stay far inside 128b
    }
    val df = rows.toDF("g", "v").repartition(8)
    val both = df.groupBy("g")
      .agg(i128(col("v")).as("got"), decSum(col("v")).as("exp"))
      .filter(col("got") =!= col("exp") ||
        col("got").isNull =!= col("exp").isNull)
    assert(both.count() == 0)
  }

  test("carries past 2^63: sums a single long cannot hold") {
    // 1000 copies of 2^62 -> sum = 2^72; also the negative mirror and
    // an alternating mix whose partial sums wander across the carry
    // boundary in both directions
    val big = Seq.fill(1000)(1L << 62)
    val neg = Seq.fill(1000)(-(1L << 62))
    val mix = (0 until 4000).map(i =>
      if (i % 2 == 0) Long.MaxValue / 3 else -(Long.MaxValue / 7))
    val cases = Seq(("big", big), ("neg", neg), ("mix", mix))
    cases.foreach { case (tag, vs) =>
      val expect = vs.map(BigInt(_)).sum
      val got = vs.toDF("v").repartition(16)
        .agg(i128(col("v")).cast("string")).head().getString(0)
      assert(BigInt(got) == expect, s"case $tag")
    }
  }

  test("null skipping and empty groups match the stock sum") {
    val df = Seq[(Int, java.lang.Long)](
      (1, 5L), (1, null), (2, null), (2, null), (3, -7L))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(i128(col("v")).as("got"), decSum(col("v")).as("exp"))
      .orderBy("g").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"group ${r.getInt(0)}")
      if (!r.isNullAt(1))
        assert(r.getDecimal(1).compareTo(r.getDecimal(2)) == 0)
    }
    // global aggregate over an empty frame -> null
    val empty = spark.range(0).select(col("id").as("v"))
      .agg(i128(col("v"))).head()
    assert(empty.isNullAt(0))
  }

  /** The former decimal formulations, kept as the parity reference. */
  private def oldFixedSum(c: Column, dec: Int): Column = {
    val unit = math.pow(10, dec)
    sum(round(c * unit).cast("decimal(38,0)")).cast("double") / lit(unit)
  }
  private def oldFixedAvg(c: Column, dec: Int): Column = {
    val unit = math.pow(10, dec)
    sum(round(c * unit).cast("decimal(38,0)")).cast("double") /
      (count(lit(1)) * lit(unit))
  }

  test("fixedSum / fixedAvg equal the former decimal forms on real data") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val r = ev.groupBy(col("user_id") % 13)
      .agg(Exact.fixedSum(col("value"), 2).as("gs"),
        oldFixedSum(col("value"), 2).as("es"),
        Exact.fixedAvg(col("value"), 2).as("ga"),
        oldFixedAvg(col("value"), 2).as("ea"))
      .filter(col("gs") =!= col("es") || col("ga") =!= col("ea"))
    assert(r.count() == 0)
  }

  test("non-finite values are skipped exactly like the decimal cast") {
    val df = Seq(1.25, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -2.75).toDF("v")
    val r = df.agg(Exact.fixedSum(col("v"), 2).as("g"),
      oldFixedSum(col("v"), 2).as("e")).head()
    assert(r.getDouble(0) == r.getDouble(1)) // -1.5 from the finite rows
    // an all-non-finite column must stay NULL, not become 0
    val r2 = Seq(Double.NaN, Double.PositiveInfinity).toDF("v")
      .agg(Exact.fixedSum(col("v"), 2).as("g"),
        oldFixedSum(col("v"), 2).as("e")).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }
}
