package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sqlite
import graft.io.Sqlite._

/** Reads a database written by STOCK sqlite3 (via python3), including
  * payloads large enough to spill into overflow-page chains — the
  * interop direction the [[Sqlite]] writer doesn't exercise. */
class SqliteInteropSpec extends AnyFunSuite {

  test("reads a stock-sqlite3 database with overflow-chain blobs") {
    val python = new java.io.File("/usr/bin/python3")
    assume(python.exists, "python3 not available")
    val path = Files.createTempDirectory("sq_interop").resolve("ext.db").toString
    val script =
      s"""import sqlite3
         |con = sqlite3.connect("$path")
         |con.execute("CREATE TABLE t (name TEXT, big BLOB, score REAL, flag INTEGER)")
         |rows = [
         |  ("small", b"abc", 1.5, 0),
         |  ("big", bytes(range(256)) * 80, -2.25, 1),   # 20480 B -> overflow
         |  ("huge", b"\\x7f" * 50000, 0.0, 1),          # multi-page chain
         |]
         |con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
         |con.commit(); con.close()
         |print("WROTE")
         |""".stripMargin
    val p = new ProcessBuilder("/usr/bin/python3", "-c", script)
      .redirectErrorStream(true).start()
    val log = scala.io.Source.fromInputStream(p.getInputStream).mkString
    p.waitFor()
    assume(log.contains("WROTE"), s"python sqlite3 write failed:\n$log")

    val rows = Sqlite.readTable(path, "t")
    assert(rows.size == 3)
    val byName = rows.map { case (_, vs) =>
      vs(0).asInstanceOf[SqlText].v -> vs
    }.toMap
    assert(byName("small")(1).asInstanceOf[SqlBlob].v.sameElements("abc".getBytes))
    val big = byName("big")(1).asInstanceOf[SqlBlob].v
    assert(big.length == 20480)
    assert((0 until 20480).forall(i => (big(i) & 0xff) == i % 256))
    val huge = byName("huge")(1).asInstanceOf[SqlBlob].v
    assert(huge.length == 50000 && huge.forall(_ == 0x7f.toByte))
    assert(byName("big")(2) == SqlReal(-2.25))
    assert(byName("big")(3) == SqlInt(1))
    assert(byName("small")(3) == SqlInt(0))
  }
}
