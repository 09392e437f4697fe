package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge

import graft.expressions.MultiPatternCount

/** Pins the Aho–Corasick automaton against hand-counted matches,
  * including the classic failure-link and output-chain cases. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String, patterns: Seq[String]): Seq[Long] =
    Seq(text).toDF("t")
      .select(Bridge.column(MultiPatternCount(
        Seq(Bridge.expression(col("t"))), patterns)).as("m"))
      .as[Seq[Long]].head()

  test("classic ushers case: suffix outputs all fire") {
    assert(counts("ushers", Seq("he", "she", "hers")) === Seq(1L, 1L, 1L))
  }

  test("overlapping matches all count") {
    assert(counts("aaaa", Seq("aa", "aaa")) === Seq(3L, 2L))
    assert(counts("aba", Seq("ab", "ba")) === Seq(1L, 1L))
  }

  test("nested phrases score both the phrase and its substring") {
    assert(counts("big table a a a slow query",
      Seq("spark", "table", "big table", "slow", "slow query", "a a")) ===
      Seq(0L, 1L, 1L, 1L, 1L, 2L))
  }

  test("matching is case-insensitive") {
    assert(counts("Spark SPARK spark", Seq("spark")) === Seq(3L))
  }

  test("patterns absent from the text count zero") {
    assert(counts("nothing here", Seq("spark", "zz top")) === Seq(0L, 0L))
  }
}
