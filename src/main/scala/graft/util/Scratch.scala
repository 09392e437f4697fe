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
    registered.forEach(p => deleteRecursively(p))
  }, "graft-scratch-cleanup"))

  /** A fresh temp directory, deleted recursively at JVM exit. */
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
    }
}
