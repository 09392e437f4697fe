package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Hdf5

/** The two "unbounded cardinality" dense-storage shapes (HDF5 File
  * Format Spec III.A.2 / III.F-G) that only appear once a group or
  * object outgrows what one block / one leaf can hold:
  *
  *  - a fractal heap whose root indirect block has INDIRECT children
  *    (rows past max_direct_rows point at nested FHIBs, the global
  *    doubling table resuming from row 0 inside each child), and
  *  - a v2 B-tree of depth 2 (internal nodes pointing at internal
  *    nodes, child pointers carrying the all_nrec subtree total whose
  *    width follows libhdf5's cum_max_nrec_size math).
  *
  * libhdf5 emits both once a dense group holds tens of thousands of
  * links (≈0.5 MB of link messages / >max-leaf records), so a NetCDF-4
  * file with very many variables hits them. The shipped writer never
  * emits them; the images are crafted byte-by-byte like
  * [[Hdf5FilteredHeapSpec]] and read through the same
  * `readDenseLinks` path the NetCDF-4 reader uses.
  */
class Hdf5DeepStructuresSpec extends AnyFunSuite {

  private def u16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def u32(o: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 4) { o.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def u64(o: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { o.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Hard-link message v1, flags 0 (1-byte name length). */
  private def linkMsg(o: ByteArrayOutputStream, name: String, addr: Long): Unit = {
    o.write(1); o.write(0); o.write(name.length)
    o.write(name.getBytes("US-ASCII")); u64(o, addr)
  }
  private def linkMsgLen(name: String): Int = 3 + name.length + 8

  /** 512-byte FHDB holding the given (inBlockOffset, name, addr)
    * links; `blockOff` is the block's heap offset (offSize = 2). */
  private def directBlock(blockOff: Int, links: Seq[(Int, String, Long)]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write("FHDB".getBytes("US-ASCII")); o.write(0)
    u64(o, 0L); u16(o, blockOff)
    val head = o.toByteArray
    val b = new Array[Byte](512)
    head.copyToArray(b, 0)
    links.foreach { case (off, name, addr) =>
      val m = new ByteArrayOutputStream()
      linkMsg(m, name, addr)
      m.toByteArray.copyToArray(b, off)
    }
    b
  }

  /** Unfiltered FRHP: width 2, startBlock = maxDirect = 512 (so
    * max_direct_rows = 2), maxHeapBits 16 → offSize 2, maxManaged 256
    * → lenSize 2; root at `rootAddr` with `curRows` rows. */
  private def frhp(rootAddr: Long, curRows: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write("FRHP".getBytes("US-ASCII")); o.write(0)
    u16(o, 5); u16(o, 0) // heap id length, no I/O filters
    o.write(0) // flags
    u32(o, 256L) // max managed object size
    u64(o, 0L); u64(o, 0L) // next huge id, huge btree
    u64(o, 0L); u64(o, 0L) // free space, free-space manager
    u64(o, 4096L); u64(o, 4096L); u64(o, 4096L) // managed/alloc/iter
    u64(o, 3L) // n managed
    u64(o, 0L); u64(o, 0L); u64(o, 0L); u64(o, 0L) // huge/tiny
    u16(o, 2) // table width
    u64(o, 512L); u64(o, 512L) // starting / max direct block size
    u16(o, 16) // max heap size bits -> offSize 2
    u16(o, 0) // starting rows
    u64(o, rootAddr)
    u16(o, curRows)
    u32(o, 0L) // checksum (unverified)
    o.toByteArray
  }

  private val Undef = -1L

  /** Image with a THREE-row root indirect block: rows 0-1 direct
    * (4 × 512-byte blocks, one unallocated), row 2 indirect — its
    * first entry a nested FHIB over two more direct blocks, its
    * second unallocated. Links live in blocks of all three tiers. */
  private def multiLevelImage(): Array[Byte] = {
    val img = new Array[Byte](4400)
    frhp(rootAddr = 512L, curRows = 3).copyToArray(img, 0)
    // root FHIB at 512: hdr 15 bytes + 4 direct + 2 indirect entries
    val ib = new ByteArrayOutputStream()
    ib.write("FHIB".getBytes("US-ASCII")); ib.write(0)
    u64(ib, 0L); u16(ib, 0) // heap header addr, block offset
    u64(ib, 1024L) // row0 col0: block A  (heap [0, 512))
    u64(ib, 1536L) // row0 col1: block B  (heap [512, 1024))
    u64(ib, Undef) // row1 col0: unallocated (heap [1024, 1536))
    u64(ib, 2048L) // row1 col1: block D  (heap [1536, 2048))
    u64(ib, 2560L) // row2 col0: child FHIB (heap [2048, 3072))
    u64(ib, Undef) // row2 col1: unallocated (heap [3072, 4096))
    u32(ib, 0L) // checksum
    ib.toByteArray.copyToArray(img, 512)
    directBlock(0, Seq((15, "alpha", 0x1111L))).copyToArray(img, 1024)
    directBlock(512, Nil).copyToArray(img, 1536)
    directBlock(1536, Seq((15, "beta", 0x2222L))).copyToArray(img, 2048)
    // child FHIB at 2560: spans 1024 bytes -> nrows = 1 (row 0, two
    // 512-byte direct blocks), per the size_to_rows math
    val cb = new ByteArrayOutputStream()
    cb.write("FHIB".getBytes("US-ASCII")); cb.write(0)
    u64(cb, 0L); u16(cb, 2048)
    u64(cb, 3072L) // block E (heap [2048, 2560))
    u64(cb, 3584L) // block F (heap [2560, 3072))
    u32(cb, 0L)
    cb.toByteArray.copyToArray(img, 2560)
    directBlock(2048, Nil).copyToArray(img, 3072)
    directBlock(2560, Seq((20, "gamma", 0x3333L))).copyToArray(img, 3584)
    // name-index B-tree at 4096: depth 0, one leaf at 4160
    val bh = new ByteArrayOutputStream()
    bh.write("BTHD".getBytes("US-ASCII")); bh.write(0); bh.write(5)
    u32(bh, 512L); u16(bh, 9); u16(bh, 0)
    bh.write(100); bh.write(40)
    u64(bh, 4160L); u16(bh, 3)
    u64(bh, 3L); u32(bh, 0L)
    bh.toByteArray.copyToArray(img, 4096)
    val lf = new ByteArrayOutputStream()
    lf.write("BTLF".getBytes("US-ASCII")); lf.write(0); lf.write(5)
    // (hash, heap id = flags + heap offset u16 + length u16)
    u32(lf, 0L); lf.write(0); u16(lf, 15); u16(lf, linkMsgLen("alpha"))
    u32(lf, 1L); lf.write(0); u16(lf, 1551); u16(lf, linkMsgLen("beta"))
    u32(lf, 2L); lf.write(0); u16(lf, 2580); u16(lf, linkMsgLen("gamma"))
    u32(lf, 0L)
    lf.toByteArray.copyToArray(img, 4160)
    img
  }

  private def writeTemp(img: Array[Byte]): String = {
    val p = Files.createTempFile("deep_structs", ".h5img")
    Files.write(p, img)
    p.toString
  }

  test("fractal heap with nested indirect blocks resolves links in all tiers") {
    val links = Hdf5.denseLinksForTest(writeTemp(multiLevelImage()), 0L, 4096L)
    assert(links === Seq(
      "alpha" -> 0x1111L, "beta" -> 0x2222L, "gamma" -> 0x3333L))
  }

  test("heap offset in an unallocated block fails loudly") {
    // retarget the beta record's heap offset into the Undef row-1 gap
    val img = multiLevelImage()
    val base = 4160 + 6 + 9 + 5 // second record's heap-offset field
    img(base) = (1100 & 0xff).toByte
    img(base + 1) = ((1100 >> 8) & 0xff).toByte
    val e = intercept[Exception] {
      Hdf5.denseLinksForTest(writeTemp(img), 0L, 4096L)
    }
    assert(e.getMessage.contains("unallocated"))
  }

  /** Image with one root-direct heap block holding nine links n0..n8
    * and a DEPTH-2 name index over them: nodeSize 46, recSize 9 →
    * leaf max 4 records, nrec width 1 byte; at depth 1 the internal
    * max is 1 record, cum_max = 9 → all_nrec width 1 byte in the
    * root's child pointers. In-order layout:
    * L0(n0 n1) I0rec(n2) L1(n3) ROOTrec(n4) L2(n5 n6) I1rec(n7) L3(n8). */
  private def deepBtreeImage(): Array[Byte] = {
    val img = new Array[Byte](1800)
    frhp(rootAddr = 512L, curRows = 0).copyToArray(img, 0)
    val names = (0 until 9).map(i => s"n$i")
    val linkSeq = names.zipWithIndex.map { case (n, i) =>
      (15 + 16 * i, n, 0x100L + i)
    }
    directBlock(0, linkSeq).copyToArray(img, 512)
    def rec(o: ByteArrayOutputStream, i: Int): Unit = {
      u32(o, i.toLong) // name hash: crafted ascending so in-order = n0..n8
      o.write(0); u16(o, 15 + 16 * i); u16(o, linkMsgLen(s"n$i"))
    }
    // header: depth 2, root internal at 1100 with 1 record
    val bh = new ByteArrayOutputStream()
    bh.write("BTHD".getBytes("US-ASCII")); bh.write(0); bh.write(5)
    u32(bh, 46L); u16(bh, 9); u16(bh, 2)
    bh.write(100); bh.write(40)
    u64(bh, 1100L); u16(bh, 1)
    u64(bh, 9L); u32(bh, 0L)
    bh.toByteArray.copyToArray(img, 1024)
    // root BTIN (depth 2): rec n4; ptrs (addr, nrec, all_nrec)
    val rt = new ByteArrayOutputStream()
    rt.write("BTIN".getBytes("US-ASCII")); rt.write(0); rt.write(5)
    rec(rt, 4)
    u64(rt, 1200L); rt.write(1); rt.write(4)
    u64(rt, 1300L); rt.write(1); rt.write(4)
    u32(rt, 0L)
    rt.toByteArray.copyToArray(img, 1100)
    // depth-1 internals: rec + ptrs (addr, nrec) — all_nrec absent
    def internal1(recIdx: Int, left: (Long, Int), right: (Long, Int)): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write("BTIN".getBytes("US-ASCII")); o.write(0); o.write(5)
      rec(o, recIdx)
      u64(o, left._1); o.write(left._2)
      u64(o, right._1); o.write(right._2)
      u32(o, 0L)
      o.toByteArray
    }
    internal1(2, (1400L, 2), (1500L, 1)).copyToArray(img, 1200)
    internal1(7, (1600L, 2), (1700L, 1)).copyToArray(img, 1300)
    def leaf(idxs: Seq[Int]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write("BTLF".getBytes("US-ASCII")); o.write(0); o.write(5)
      idxs.foreach(rec(o, _))
      u32(o, 0L)
      o.toByteArray
    }
    leaf(Seq(0, 1)).copyToArray(img, 1400)
    leaf(Seq(3)).copyToArray(img, 1500)
    leaf(Seq(5, 6)).copyToArray(img, 1600)
    leaf(Seq(8)).copyToArray(img, 1700)
    img
  }

  test("depth-2 v2 btree yields every record, in order") {
    val links = Hdf5.denseLinksForTest(writeTemp(deepBtreeImage()), 0L, 1024L)
    assert(links === (0 until 9).map(i => s"n$i" -> (0x100L + i)))
  }

  test("hostile mutations of both images decode or reject, never hang") {
    val rnd = new scala.util.Random(20260816L)
    val bases = Seq(
      (multiLevelImage(), 4096L),
      (deepBtreeImage(), 1024L))
    for (_ <- 0 until 100; (base, bt) <- bases) {
      val img = base.clone()
      val n = 1 + rnd.nextInt(3)
      for (_ <- 0 until n) {
        val i = rnd.nextInt(img.length)
        img(i) = (img(i) ^ (1 + rnd.nextInt(255))).toByte
      }
      val path = writeTemp(img)
      try { Hdf5.denseLinksForTest(path, 0L, bt); () }
      catch { case _: Exception => () }
    }
  }
}
