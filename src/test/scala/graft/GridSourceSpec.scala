package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.GridBinary

/** DataSource V2 grid scan: long-form expansion, column pruning, filter
  * pushdown and time-slab partition pruning. */
class GridSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path: String = {
    val p = Files.createTempDirectory("ggrd").resolve("t2.ggrd").toString
    GridBinary.write(p,
      times = Array.tabulate(24)(t => t * 3600L * 1000000L),
      lats = Array.tabulate(10)(_ * 0.5),
      lons = Array.tabulate(20)(_ * 0.25),
      value = (t, y, x) => ((t * 31 + y * 7 + x) % 100) / 4.0)
    p
  }

  private def grid = spark.read.format("graft.sources.GridSource").load(path)

  test("expands the dense grid to long-form rows with axis coordinates") {
    assert(grid.count() == 24 * 10 * 20)
    val r = grid.filter($"y" === 3 && $"x" === 4 && $"time" === lit("1970-01-01 02:00:00").cast("timestamp"))
      .select($"lat", $"lon", $"value").head()
    assert(r.getDouble(0) == 1.5)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == ((2 * 31 + 3 * 7 + 4) % 100) / 4.0)
  }

  test("y/x range filters are pushed into the scan") {
    val q = grid.filter($"y" >= 2 && $"y" <= 4 && $"x" < 5)
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters=[") && desc.contains("GreaterThanOrEqual(y,2)"),
      s"pushdown missing in plan:\n$desc")
    assert(q.count() == 24 * 3 * 5)
    // the whole-column aggregate still sees correct pruned data
    assert(q.agg(max("x")).head().getInt(0) == 4)
  }

  test("time predicates prune whole input partitions (IO slabs)") {
    val full = grid.groupBy("time").count()
    assert(full.count() == 24)
    val sliced = grid.filter($"time" >= lit("1970-01-01 18:00:00").cast("timestamp"))
    // partition count of the scan RDD reflects slab pruning: 6 of 24
    assert(sliced.rdd.getNumPartitions == 6)
    assert(sliced.count() == 6 * 10 * 20)
  }

  test("column pruning: a projection scan reports only required columns") {
    val q = grid.select("value")
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("ReadSchema=value"), s"column pruning missing:\n$desc")
    assert(q.agg(sum("value")).head().getDouble(0) > 0)
  }

  test("multi-file directory: one InputPartition per (file, slab), pruned per file") {
    val dir = Files.createTempDirectory("ggrd_multi")
    for (k <- 0 until 4)
      GridBinary.write(dir.resolve(f"slab-$k%02d.ggrd").toString,
        times = Array.tabulate(6)(i => (k * 6 + i) * 3600L * 1000000L),
        lats = Array.tabulate(10)(_ * 0.5),
        lons = Array.tabulate(20)(_ * 0.25),
        value = (tl, y, x) => (((k * 6 + tl) * 31 + y * 7 + x) % 100) / 4.0)
    val multi = spark.read.format("graft.sources.GridSource").load(dir.toString)
    // same logical dataset as the single-file fixture
    assert(multi.rdd.getNumPartitions == 24) // 4 files × 6 slabs
    assert(multi.count() == 24 * 10 * 20)
    val a = multi.select("time", "y", "x", "value").as[(java.sql.Timestamp, Int, Int, Double)]
      .collect().toSet
    val b = grid.select("time", "y", "x", "value").as[(java.sql.Timestamp, Int, Int, Double)]
      .collect().toSet
    assert(a == b)
    // a time predicate prunes file 0 and 1 wholly, file 2 partially
    val sliced = multi.filter($"time" >= lit("1970-01-01 15:00:00").cast("timestamp"))
    assert(sliced.rdd.getNumPartitions == 9) // slabs 15..23
    assert(sliced.count() == 9 * 10 * 20)
  }

  test("feeds the standard pipeline: daily stats over the grid source") {
    import graft.grid.GridConfig
    val stats = graft.pipelines.Pipelines.temporalDailyStats(
      grid, GridConfig("x", "y", "lon", "lat", "time", "value"))
    assert(stats.count() == 200) // one row per cell, single day
    assert(stats.agg(max("n_days")).head().getLong(0) == 1)
  }
}
