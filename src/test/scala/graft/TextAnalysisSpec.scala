package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Repetition-signal specs: the sorted run-length formulation of
  * topGramCount must equal the definitional max-multiplicity count.
  */
class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  /** Definitional max gram multiplicity, computed in plain Scala. */
  private def bruteTop(text: String, n: Int): Int = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.length < n) 0
    else toks.sliding(n).map(_.mkString(" ")).toSeq
      .groupBy(identity).values.map(_.size).max
  }

  test("topGramCount equals definitional max multiplicity") {
    val docs = Seq(
      "the cat sat on the mat",
      "buy now buy now buy now buy now",
      "a b a b a b a b a",           // overlapping repeats
      "one two three four five",      // all grams unique
      "word",                         // fewer tokens than n -> 0
      "  padded   spacing   padded   spacing  ",
      "Case CASE case Case CASE case")
    val df = docs.toDF("text")
      .select(col("text"), TextAnalysis.topGramCount(col("text"), 2).as("top2"))
    val got = df.as[(String, Int)].collect().toMap
    docs.foreach { d =>
      assert(got(d) == bruteTop(d, 2), s"doc: '$d'")
    }
  }

  test("topGramCount handles degenerate inputs") {
    val df = Seq("", " ", "x").toDF("text")
      .select(TextAnalysis.topGramCount(col("text"), 2).as("top2"))
    assert(df.as[Int].collect().forall(_ == 0))
  }

  test("RepetitionStats expression equals the Column formulation on real docs") {
    import org.apache.spark.sql.graftbridge.Bridge
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val r = Bridge.column(graft.expressions.RepetitionStats(
      Seq(Bridge.expression(col("text"))), 2))
    val both = docs.select(col("doc_id"), r.as("r"),
        TextAnalysis.tokenCount(col("text")).as("c_toks"),
        TextAnalysis.topGramCount(col("text"), 2).as("c_top"),
        TextAnalysis.dupTokenFraction(col("text")).as("c_dup"))
      .select(col("doc_id"),
        (col("r.n_toks") === col("c_toks")).as("toks_eq"),
        (col("r.top_gram") === col("c_top")).as("top_eq"),
        (((col("r.n_toks") - col("r.n_distinct")) /
          greatest(col("r.n_toks"), lit(1)).cast("double")) === col("c_dup"))
          .as("dup_eq"))
    val bad = both.filter(!col("toks_eq") || !col("top_eq") || !col("dup_eq"))
    assert(bad.count() == 0, bad.take(3).mkString("\n"))
  }

  test("dupTokenFraction matches definitional value") {
    val df = Seq("a a a a", "a b c d", "").toDF("text")
      .select(TextAnalysis.dupTokenFraction(col("text")).as("f"))
    assert(df.as[Double].collect().toSeq == Seq(0.75, 0.0, 0.0))
  }
}
