package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.geom.st
import graft.operators.{SpatialJoin, Voronoi}

/** Memory-boundedness probe: the reference's documented OOM case run
  * under a deliberately SMALL driver heap.
  *
  * The reference regrids in RAM and warns it dies on large grids
  * (`delphine/regrid.py:8` "If you attempt to do this with too large a
  * grid, you will run out of memory"); BASELINE.md carries that cliff
  * as the baseline's failure mode. Our claim has always been
  * "memory-bounded where the reference dies" — this tool makes that a
  * MEASUREMENT: the identical 1M-source × 33k-target conservative
  * overlay + conservation check (ScaleBench stages 2-3, same
  * construction) plus the 1M-seed auto-tiled Voronoi, executed with
  * `SPARK_DRIVER_MEM=2g` (vs the suite's 8g), all 32 threads live.
  * Completion is the point; the emitted spill counters show HOW it
  * completes when the working set exceeds the heap — Tungsten spills
  * operators to disk instead of failing, which is exactly the behavior
  * that scales to a 100 TB cluster where per-executor memory is always
  * finite.
  *
  * Prints one JSON line:
  * `{"metric":"lowmem","heap_mb":…,"overlay_sec":…,"conservation_ratio":…,
  *   "voronoi_sec":…,"spill_disk_mb":…,"spill_mem_mb":…,"peak_exec_mb":…}`
  *
  * Run: `SPARK_DRIVER_MEM=<heap> sbt "runMain graft.tools.LowMemProbe"`.
  * Measured ladder (NOTES_r11): 2g and 1g — full speed, zero spill,
  * 24 MB peak execution memory; 512m — completes ~25% slower with
  * 76 MB memory-spill / 10 MB disk-spill. The conservation ratio must
  * still be exact (1.0 ± 1e-12) at every point: spilling must not
  * change a single bit of the answer.
  */
object LowMemProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val diskSpill = new AtomicLong(0L)
    val memSpill = new AtomicLong(0L)
    val peakExec = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          diskSpill.addAndGet(m.diskBytesSpilled)
          memSpill.addAndGet(m.memoryBytesSpilled)
          peakExec.getAndAccumulate(m.peakExecutionMemory, math.max)
        }
      }
    })

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // identical construction to ScaleBench stages 1-3: 1M unit source
    // cells with integer pop, 182x182 target grid over the same extent
    val n = 1000
    val src = spark.range(n.toLong * n)
      .select(col("id"),
        (col("id") % n).cast("double").as("sx"),
        (col("id") / n).cast("long").cast("double").as("sy"),
        (col("id") % 97 + 1).cast("long").as("pop"))
      .withColumn("pop_geom", st.makeBox(col("sx"), col("sy"),
        col("sx") + 1.0, col("sy") + 1.0))
      .drop("sx", "sy")
    val m = 182
    val w = n.toDouble / m
    val tgt = spark.range(m.toLong * m)
      .select(col("id").as("tid"),
        (col("id") % m).cast("double").as("tx"),
        (col("id") / m).cast("long").cast("double").as("ty"))
      .withColumn("tgt_geom", st.makeBox(col("tx") * w, col("ty") * w,
        (col("tx") + 1.0) * w, (col("ty") + 1.0) * w))
      .drop("tx", "ty")

    val (_, tOverlay) = timed {
      SpatialJoin.overlayIntersection(src, tgt, "pop_geom", "tgt_geom", 8.0)
        .groupBy("tid")
        .agg(sum(col("pop") * col("piece_area")).as("population"))
        .count()
    }

    val (ratio, tConserve) = timed {
      val regridTotal = SpatialJoin
        .overlayIntersection(src, tgt, "pop_geom", "tgt_geom", 8.0)
        .agg(sum(col("pop") * col("piece_area")))
        .head().getDouble(0)
      val origTotal = src.agg(sum(col("pop"))).head().getLong(0).toDouble
      regridTotal / origTotal
    }
    require(math.abs(ratio - 1.0) < 1e-12,
      s"conservation broke under memory pressure: $ratio")

    val (vorCells, tVoronoi) = timed {
      val seeds = spark.range(n.toLong * n).select(
        col("id"),
        ((col("id") % n).cast("double") + 0.5).as("px"),
        ((col("id") / n).cast("long").cast("double") + 0.5).as("py"))
      Voronoi.tessellate(seeds, "id", "px", "py",
        (0.0, 0.0, n.toDouble, n.toDouble))
        .count()
    }
    require(vorCells == n.toLong * n, s"voronoi lost cells: $vorCells")

    val heapMb = Runtime.getRuntime.maxMemory / (1024 * 1024)
    println(s"""{"metric":"lowmem","heap_mb":$heapMb,"cpus":$cpus,""" +
      s""""overlay_sec":$tOverlay,"conservation_sec":$tConserve,""" +
      s""""conservation_ratio":$ratio,"voronoi_sec":$tVoronoi,""" +
      s""""voronoi_cells":$vorCells,""" +
      s""""spill_disk_mb":${diskSpill.get / (1024 * 1024)},""" +
      s""""spill_mem_mb":${memSpill.get / (1024 * 1024)},""" +
      s""""peak_exec_mb":${peakExec.get / (1024 * 1024)}}""")
    spark.stop()
  }
}
