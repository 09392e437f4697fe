package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Hdf5

/** SHARED header messages (HDF5 File Format Spec IV.A.1 "Shared
  * Message"): a message whose flag bit 1 is set carries, instead of
  * its body, a pointer to where the real body lives. The v1/v2 and v3
  * "committed" forms point at another OBJECT HEADER — this is how a
  * committed (named) datatype reaches every dataset and attribute
  * that uses it (h5py: `f['t'] = np.dtype(...)`; netCDF-4 user
  * types). The v3 SOHM-heap form is opt-in and rejects loudly.
  *
  * Images are crafted byte-by-byte (v1 object headers, absolute
  * addresses) like [[Hdf5DeepStructuresSpec]] and read through the
  * same headerMessages/parseAttr paths the NetCDF-4 reader uses.
  */
class Hdf5SharedMessageSpec extends AnyFunSuite {

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

  /** IEEE float64 datatype message body — the same 20 bytes the
    * writer's dtFloat(8) emits. */
  private def dtF64(): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(0x11); o.write(0x20); o.write(63); o.write(0)
    u32(o, 8L); u16(o, 0); u16(o, 64)
    o.write(52); o.write(11); o.write(0); o.write(52)
    u32(o, 1023L)
    o.toByteArray
  }

  /** v1 object header at a fixed address holding the given messages
    * ((type, flags, body) triples). */
  private def v1Header(msgs: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(1); o.write(0) // version, reserved
    u16(o, msgs.length)
    u32(o, 1L) // reference count
    u32(o, msgs.map(m => 8 + m._3.length).sum.toLong) // chunk-0 size
    u32(o, 0L) // pad to the 16-byte message start
    msgs.foreach { case (t, f, body) =>
      u16(o, t); u16(o, body.length)
      o.write(f); o.write(0); o.write(0); o.write(0)
      o.write(body)
    }
    o.toByteArray
  }

  private def sharedV2(addr: Long): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(2); o.write(2) // version 2, type: committed
    u64(o, addr)
    o.toByteArray
  }

  private def img(): Array[Byte] = {
    val im = new Array[Byte](3200)
    // B @512: a real float64 datatype — the "committed datatype" object
    v1Header(Seq((0x0003, 0, dtF64()))).copyToArray(im, 512)
    // A @1024: dataset-style header whose datatype message is SHARED
    // (flag 0x02), body = shared-v2 pointer at B
    v1Header(Seq((0x0003, 0x02, sharedV2(512L)))).copyToArray(im, 1024)
    // C @1536: shared-v3 SOHM-heap form (type 1 + 8-byte heap id)
    val sohm = new ByteArrayOutputStream()
    sohm.write(3); sohm.write(1); u64(sohm, 0x1234L)
    v1Header(Seq((0x0003, 0x02, sohm.toByteArray))).copyToArray(im, 1536)
    // D @2048: self-referential shared message (resolution must bound)
    v1Header(Seq((0x0003, 0x02, sharedV2(2048L)))).copyToArray(im, 2048)
    // E @2560: attribute whose DATATYPE slot is shared (flag bit 0)
    val attr = new ByteArrayOutputStream()
    attr.write(2); attr.write(0x01) // attr v2, dt-shared
    u16(attr, 3); u16(attr, 10); u16(attr, 8) // name, dt, ds sizes
    attr.write("at".getBytes("US-ASCII")); attr.write(0)
    attr.write(sharedV2(512L))
    attr.write(1); attr.write(0); attr.write(0) // dataspace v1, rank 0
    (0 until 5).foreach(_ => attr.write(0))
    u64(attr, java.lang.Double.doubleToLongBits(2.5))
    v1Header(Seq((0x000C, 0, attr.toByteArray))).copyToArray(im, 2560)
    im
  }

  private def writeTemp(b: Array[Byte]): String = {
    val p = Files.createTempFile("shared_msgs", ".h5img")
    Files.write(p, b)
    p.toString
  }

  test("shared datatype message resolves to the committed header's datatype") {
    val p = writeTemp(img())
    assert(Hdf5.dtypeForTest(p, 1024L) == Hdf5.dtypeForTest(p, 512L))
  }

  test("attribute with a shared datatype slot parses against the committed type") {
    val p = writeTemp(img())
    val (name, dt, shape) = Hdf5.attrForTest(p, 2560L)
    assert(name == "at")
    assert(dt == Hdf5.dtypeForTest(p, 512L))
    assert(shape.isEmpty)
  }

  test("SOHM-heap shared form rejects loudly") {
    val e = intercept[Exception] { Hdf5.dtypeForTest(writeTemp(img()), 1536L) }
    assert(e.getMessage.contains("SOHM"))
  }

  test("self-referential shared message is bounded, not an infinite loop") {
    val e = intercept[Exception] { Hdf5.dtypeForTest(writeTemp(img()), 2048L) }
    assert(e.getMessage.toLowerCase.contains("indirection"))
  }

  test("hostile mutations decode or reject") {
    val base = img()
    val rnd = new scala.util.Random(816L)
    for (_ <- 0 until 150) {
      val b = base.clone()
      for (_ <- 0 to rnd.nextInt(4))
        b(512 + rnd.nextInt(b.length - 512)) = rnd.nextInt(256).toByte
      val p = writeTemp(b)
      for (addr <- Seq(1024L, 2560L))
        try { Hdf5.dtypeForTest(p, addr); () }
        catch { case _: Exception => () }
    }
  }
}
