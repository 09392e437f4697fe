package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  test("misra-gries summary is a superset of items above N/(c+1)") {
    // adversarial stream: one item at 25%, the rest near-unique noise
    val stream = (0 until 4000).map { i =>
      if (i % 4 == 0) "heavy" else s"noise${i}"
    }
    // c = 7: guarantee covers anything above 4000/8 = 500; "heavy" has 1000
    val kept = HeavyHitters.misraGries(stream.iterator, 7).toSet
    assert(kept.contains("heavy"))
    assert(kept.size <= 7)
    // order independence of the GUARANTEE (summary content may differ)
    val kept2 = HeavyHitters.misraGries(scala.util.Random.shuffle(stream).iterator, 7).toSet
    assert(kept2.contains("heavy"))
  }

  test("frequentItems equals the exact GROUP BY / HAVING") {
    val rows = (0 until 10000).map { i =>
      val item = if (i % 3 == 0) "alpha" // 3334
        else if (i % 5 == 0) "beta"      // 1333
        else if (i % 7 == 0) "gamma"     // 953
        else s"tail${i % 2500}"          // ≤ 3 each
      Tuple1(item)
    }.toDF("w")
    val expected = rows.groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 700)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = HeavyHitters.frequentItems(rows, col("w"), support = 700L,
        capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
    // alpha 3334, beta 1333, gamma 762 — all above support; tails ≤ 3
    assert(got.map(_._1) === Set("alpha", "beta", "gamma"))
  }

  test("under-capacity fails loudly instead of silently dropping items") {
    val rows = (0 until 10000).map(i => Tuple1(s"w${i % 50}")).toDF("w")
    // N=10000, capacity 9: guarantee only covers counts > 1000; support
    // 100 is NOT guaranteed -> must throw, not return a partial answer
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(rows, col("w"), support = 100L,
        capacity = 9).collect()
    }
    assert(e.getMessage.contains("capacity"))
  }

  test("ngrams keeps multiplicity, unlike the distinct shingle set") {
    val df = Seq(Tuple1("a b a b a b")).toDF("t")
    val grams = df.select(explode(HeavyHitters.ngrams(col("t"), 2)).as("g"))
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grams === Map("a b" -> 3L, "b a" -> 2L))
  }

  test("compiled ngrams equals the HOF formulation, incl. short docs") {
    val docs = Seq("a b c d e", "  Mixed CASE  words HERE  ", "one two",
      "solo", "", "x y z").toDF("t")
    val hof = {
      val toks = split(trim(lower(col("t"))), "\\s+")
      when(size(toks) > 3,
        transform(sequence(lit(0), size(toks) - 3), i =>
          concat_ws(" ", slice(toks, i + 1, lit(3)))))
        .otherwise(array(concat_ws(" ", toks)))
    }
    val rows = docs.select(col("t"), HeavyHitters.ngrams(col("t"), 3).as("a"),
        hof.as("b"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"doc='${r.getString(0)}'")
    }
  }
}
