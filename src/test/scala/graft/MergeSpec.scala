package graft

import graft.operators.Merge

/** Hand-computed MERGE upserts, including the source-NULL contract. */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  test("updates replace, inserts append, untouched rows persist") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val source = Seq((2L, "B"), (9L, "new")).toDF("id", "v")
    val got = Merge.upsert(target, source, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "new"))
  }

  test("a matched source row wins wholesale — its NULLs are kept") {
    val target = Seq((1L, Some("a")), (2L, Some("b"))).toDF("id", "v")
    val source = Seq((2L, Option.empty[String])).toDF("id", "v")
    val got = Merge.upsert(target, source, "id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got === Map(1L -> "a", 2L -> null))
  }

  test("mismatched schemas fail loudly") {
    val target = Seq((1L, "a")).toDF("id", "v")
    val source = Seq((1L, "a")).toDF("id", "other")
    intercept[IllegalArgumentException] {
      Merge.upsert(target, source, "id")
    }
  }
}
