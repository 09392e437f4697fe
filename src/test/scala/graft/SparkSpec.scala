package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  // Suites persist intermediate frames (dedup signature/bucket tables,
  // query results) that would otherwise accumulate in the SHARED
  // session for the whole run — the r9 full sweep OOM'd the 8g test
  // JVM with the heap full of cached blocks. Dropping this suite's
  // cache on exit keeps the steady-state footprint one-suite-sized.
  override def afterAll(): Unit =
    if (SparkSpec.started) spark.catalog.clearCache()
}

object SparkSpec {
  @volatile private[graft] var started = false
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    started = true
    s
  }
}
