package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's short-stdout-line contract (VERDICT r16 Next #2):
  * the `queries` map carries the top-30 most expensive queries and the
  * whole line must survive the driver's 2000-char stdout tail cap —
  * measured here against the REAL declared query-name set, not a
  * synthetic one, so a future long-named query that would push the
  * line over the cap fails this suite instead of silently truncating
  * the artifact back to `parsed: null`.
  */
class BenchShortLineSpec extends AnyFunSuite {

  test("top-30 map is descending by median, name-tiebroken, k-capped") {
    val medians = Seq("b" -> 2.0, "a" -> 2.0, "c" -> 5.0, "d" -> 0.001)
    val json = Bench.shortQueriesJson(medians, k = 3)
    assert(json === """{"c":5.000,"a":2.000,"b":2.000}""")
  }

  test("full short line stays under the driver 2000-char tail cap " +
      "with the real 188 query names at worst-case magnitudes") {
    // worst realistic case: every declared query named, three-digit
    // medians (999.999 s — far beyond anything the suite produces)
    val medians = SparkEntry.queries.keys.map(_ -> 999.999).toSeq
    val topQs = Bench.shortQueriesJson(medians)
    val short = s"""{"metric":"total","value":187961.81199999998,""" +
      s""""unit":"sec","total_sec":187961.81199999998,"queries":$topQs,""" +
      s""""queries_n":${medians.size},"sf":"/root/testdata/sf0.1",""" +
      s""""detail":"bench_full.json","steal_delta":123456789,""" +
      s""""load_end":32.15,"membw_gbps":8.876543210987654,"trials":3}"""
    assert(short.length < 1900,
      s"short bench line ${short.length} chars — too close to the " +
        "2000-char driver tail cap")
    // and it parses as JSON with the map populated
    assert(topQs.startsWith("{\"") && topQs.count(_ == ':') === 30)
  }
}
