package graft.io

/** From-scratch BASELINE JPEG decoder (ITU-T T.81 sequential DCT) —
  * completes the real-codec trio ([[Png]] lossless image, [[Wav]]
  * audio, this for the dominant lossy web-image format).
  *
  * Implemented per the public spec: marker segment walk (APPn/COM
  * skipped), DQT (8- and 16-bit precision), DHT (canonical Huffman
  * from BITS/HUFFVAL), SOF0/SOF1 frames (8-bit precision, gray or
  * YCbCr, arbitrary H×V sampling factors up to 4), DRI + RSTn restart
  * handling (DC predictors and bit buffer reset), the entropy-coded
  * segment with 0xFF00 byte stuffing, DC difference EXTEND decoding,
  * AC run/size with ZRL and EOB, dequantization through the zigzag
  * order, a double-precision separable 8×8 inverse DCT, box (nearest)
  * chroma upsampling and the JFIF YCbCr→RGB transform. Progressive
  * (SOF2), arithmetic coding, hierarchical modes, 12-bit precision
  * and CMYK streams are rejected LOUDLY — never mis-decoded.
  *
  * Two sanctioned differences from libjpeg-family decoders (asserted
  * within tolerance against the JDK's ImageIO in the spec): the IDCT
  * is the exact-definition float transform (theirs is a scaled
  * integer approximation, ±1/pixel), and chroma upsampling is box
  * replication (theirs defaults to a triangle filter, which differs
  * near chroma edges only). Decoding is row-local like every codec
  * here — payloads decode inside the scan stage.
  */
object Jpeg {

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cosine basis: cos((2x+1) u π / 16) scaled by C(u)/2 */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // canonical code assignment per T.81 annex C
    val maxcode = new Array[Int](17)
    val mincode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxcode(l) = code - 1
        if (bits(l - 1) == 0) maxcode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valptr(len) + (code - mincode(len)))
    def hasLen(len: Int, code: Int): Boolean =
      maxcode(len) >= 0 && code <= maxcode(len)
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var sawMarker = -1 // the RST/EOI marker that terminated the stream

    def align(): Unit = { buf = 0; cnt = 0 }

    /** Next bit of the entropy-coded segment; 0xFF00 unstuffs to 0xFF;
      * a real marker ends the segment ([[sawMarker]]). */
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length)
          throw new IllegalArgumentException("truncated JPEG scan")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val b2 = if (pos < data.length) data(pos) & 0xff else 0xd9
          if (b2 == 0x00) pos += 1 // stuffed
          else {
            // a real marker: leave pos AT the 0xFF so the restart
            // handler can consume it; feed zero bits meanwhile (the
            // spec's behavior past the final EOB)
            sawMarker = b2; b = 0; pos -= 1
          }
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >>> cnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decode(h: Huff): Int = {
      var code = bit()
      var len = 1
      while (!h.hasLen(len, code)) {
        code = (code << 1) | bit()
        len += 1
        if (len > 16)
          throw new IllegalArgumentException("corrupt JPEG Huffman code")
      }
      h.value(len, code)
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an n-bit magnitude to its signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
    var pred: Int = 0
    var plane: Array[Byte] = null
    var planeW: Int = 0
    var planeH: Int = 0
  }

  /** Decode to the shared row-major interleaved form ([[Png.Image]]):
    * channels = 1 (grayscale) or 3 (RGB from YCbCr). */
  def decode(bytes: Array[Byte]): Png.Image = {
    require(bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI")
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var out: Png.Image = null

    def u16(off: Int): Int = {
      require(off + 2 <= bytes.length, "truncated JPEG: segment header")
      ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    }
    def seg(off: Int): Int = { // validated segment length
      val len = u16(off)
      require(len >= 2 && off + len <= bytes.length,
        s"truncated JPEG: segment length $len at $off")
      len
    }

    while (out == null) {
      require(pos + 2 <= bytes.length, "truncated JPEG: marker")
      require((bytes(pos) & 0xff) == 0xff, f"JPEG marker sync at $pos")
      var m = bytes(pos + 1) & 0xff
      pos += 2
      while (m == 0xff) { m = bytes(pos) & 0xff; pos += 1 } // fill bytes
      m match {
        case 0xd9 => throw new IllegalArgumentException("JPEG EOI before scan")
        case 0x01 => () // TEM, standalone
        case rst if rst >= 0xd0 && rst <= 0xd7 => ()
        case 0xc0 | 0xc1 => // baseline / extended sequential
          val len = seg(pos)
          val prec = bytes(pos + 2) & 0xff
          require(prec == 8, s"unsupported JPEG precision $prec")
          height = u16(pos + 3)
          width = u16(pos + 5)
          val nc = bytes(pos + 7) & 0xff
          require(nc == 1 || nc == 3,
            s"unsupported JPEG component count $nc (gray/YCbCr only)")
          comps = Array.tabulate(nc) { c =>
            val off = pos + 8 + 3 * c
            val hv = bytes(off + 1) & 0xff
            Comp(bytes(off) & 0xff, hv >> 4, hv & 15, bytes(off + 2) & 0xff)
          }
          comps.foreach(c => require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
            s"bad sampling ${c.h}x${c.v}"))
          pos += len
        case 0xc2 =>
          throw new IllegalArgumentException(
            "unsupported JPEG: progressive (SOF2)")
        case sof if (sof >= 0xc3 && sof <= 0xcf) && sof != 0xc4 =>
          throw new IllegalArgumentException(
            if (sof == 0xcc) "unsupported JPEG: arithmetic coding (DAC)"
            else f"unsupported JPEG frame type SOF${sof - 0xc0}")
        case 0xdb => // DQT
          val len = seg(pos)
          var p = pos + 2
          while (p < pos + len) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0 || pq == 1, s"DQT precision $pq")
            p += 1
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) bytes(p + i) & 0xff
                else u16(p + 2 * i)
              i += 1
            }
            qt(tq) = t
            p += (if (pq == 0) 64 else 128)
          }
          pos += len
        case 0xc4 => // DHT
          val len = seg(pos)
          var p = pos + 2
          while (p < pos + len) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            require(tc <= 1 && th <= 3, s"DHT class $tc id $th")
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
            val h = new Huff(bits, vals)
            if (tc == 0) dcHuff(th) = h else acHuff(th) = h
            p += 17 + n
          }
          pos += len
        case 0xdd => // DRI
          val len = seg(pos)
          restartInterval = u16(pos + 2)
          pos += len
        case 0xda => // SOS — decode the scan
          require(comps != null, "JPEG SOS before SOF")
          val len = seg(pos)
          val ns = bytes(pos + 2) & 0xff
          require(ns == comps.length,
            s"JPEG scan components $ns != frame ${comps.length} " +
              "(multi-scan baseline not supported)")
          var p = pos + 3
          for (_ <- 0 until ns) {
            val cid = bytes(p) & 0xff
            val tt = bytes(p + 1) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"SOS component $cid"))
            c.dcTable = tt >> 4
            c.acTable = tt & 15
            p += 2
          }
          pos += len
          out = decodeScan(bytes, pos, comps, qt, dcHuff, acHuff,
            width, height, restartInterval)
        case _ => // APPn, COM, and anything else with a length
          pos += seg(pos)
      }
    }
    out
  }

  private def decodeScan(bytes: Array[Byte], start: Int, comps: Array[Comp],
      qt: Array[Array[Int]], dcHuff: Array[Huff], acHuff: Array[Huff],
      width: Int, height: Int, restartInterval: Int): Png.Image = {
    require(width > 0 && height > 0, s"bad frame ${width}x$height")
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      c.planeW = mcusX * 8 * c.h
      c.planeH = mcusY * 8 * c.v
      c.plane = new Array[Byte](c.planeW * c.planeH)
      c.pred = 0
      require(qt(c.tq) != null, s"missing quant table ${c.tq}")
    }
    val br = new BitReader(bytes, start)
    val coef = new Array[Int](64)
    val blk = new Array[Byte](64)

    def decodeBlock(c: Comp, bx: Int, by: Int): Unit = {
      val dc = dcHuff(c.dcTable)
      val ac = acHuff(c.acTable)
      require(dc != null && ac != null,
        s"missing Huffman tables ${c.dcTable}/${c.acTable}")
      val q = qt(c.tq)
      java.util.Arrays.fill(coef, 0)
      val t = br.decode(dc)
      require(t <= 11, s"DC category $t")
      c.pred += extend(br.receive(t), t)
      coef(0) = c.pred * q(0)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = br.decode(ac)
        val r = rs >> 4
        val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else done = true // EOB
        } else {
          k += r
          require(k < 64, "AC index overflow")
          coef(Zigzag(k)) = extend(br.receive(s), s) * q(k)
          k += 1
        }
      }
      idct(coef, blk)
      // place into the component plane (planes are MCU-padded, no clip)
      val x0 = bx * 8; val y0 = by * 8
      var y = 0
      while (y < 8) {
        System.arraycopy(blk, y * 8, c.plane, (y0 + y) * c.planeW + x0, 8)
        y += 1
      }
    }

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // discard pad bits, consume the RSTn marker, reset predictors.
        // After align(), pos sits at the 0xFF of the marker (bit() never
        // consumes a marker byte).
        br.align()
        var p = br.pos
        while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff &&
            (bytes(p + 1) & 0xff) == 0xff) p += 1 // fill bytes
        require(p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff,
          "missing RST marker")
        val m = bytes(p + 1) & 0xff
        require(m >= 0xd0 && m <= 0xd7, f"expected RST, got FF$m%02X")
        br.pos = p + 2
        br.sawMarker = -1
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      comps.foreach { c =>
        var v = 0
        while (v < c.v) {
          var h = 0
          while (h < c.h) {
            decodeBlock(c, mx * c.h + h, my * c.v + v)
            h += 1
          }
          v += 1
        }
      }
      mcu += 1
    }

    // assemble: upsample (box) + color transform
    if (comps.length == 1) {
      val c = comps(0)
      val px = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(c.plane, y * c.planeW, px, y * width, width)
        y += 1
      }
      Png.Image(width, height, 1, px)
    } else {
      val Array(cy, cb, cr) = comps
      val px = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val yY = y * cy.v / maxV
        val yB = y * cb.v / maxV
        val yR = y * cr.v / maxV
        var x = 0
        while (x < width) {
          val lum = cy.plane(yY * cy.planeW + x * cy.h / maxH) & 0xff
          val b = (cb.plane(yB * cb.planeW + x * cb.h / maxH) & 0xff) - 128
          val r = (cr.plane(yR * cr.planeW + x * cr.h / maxH) & 0xff) - 128
          val o = (y * width + x) * 3
          px(o) = clamp(lum + 1.402 * r)
          px(o + 1) = clamp(lum - 0.344136 * b - 0.714136 * r)
          px(o + 2) = clamp(lum + 1.772 * b)
          x += 1
        }
        y += 1
      }
      Png.Image(width, height, 3, px)
    }
  }

  private def clamp(v: Double): Byte = {
    val i = math.round(v).toInt
    (if (i < 0) 0 else if (i > 255) 255 else i).toByte
  }

  /** Exact-definition separable 2-D inverse DCT + level shift. */
  private def idct(coef: Array[Int], out: Array[Byte]): Unit = {
    // rows: tmp(u, x) = Σ_v C(v)/2 F(u,v) basis(v)(x)
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += coef(u * 8 + v) * Basis(v)(x); v += 1 }
        tmp(u * 8 + x) = s
        x += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += Basis(uu)(y) * tmp(uu * 8 + x); uu += 1 }
        out(y * 8 + x) = clamp(s + 128.0)
        x += 1
      }
      y += 1
    }
  }
}
