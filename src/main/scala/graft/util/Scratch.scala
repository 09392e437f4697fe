package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Session-scoped scratch directories. Query constructors that stage
  * data through the filesystem (WARC/Zarr/shapefile round-trips) used
  * to `createTempDirectory` and never clean up, so every invocation —
  * including plan audits that build all queries — leaked a copy of the
  * corpus into /tmp. Every directory handed out here is registered
  * with one JVM shutdown hook that deletes it recursively; re-invoking
  * a query still gets a fresh directory (round-trip determinism), but
  * nothing outlives the session.
  */
object Scratch {
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    // per-entry guard: one directory failing to delete (late writer,
    // walk-snapshot race) must not abandon cleanup of the rest
    registered.forEach { p =>
      try deleteRecursively(p)
      catch { case _: Throwable => () }
    }
  }, "graft-scratch-cleanup"))

  /** A fresh temp directory, deleted recursively at JVM exit. */
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally walk.close()
    }
}
