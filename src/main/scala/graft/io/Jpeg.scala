package graft.io

/** From-scratch JPEG decoder (ITU-T T.81): BASELINE sequential AND
  * PROGRESSIVE DCT — completes the real-codec trio ([[Png]] lossless
  * image, [[Wav]] audio, this for the dominant lossy web-image
  * format, including the progressive form most web encoders emit).
  *
  * Implemented per the public spec: marker segment walk (APPn/COM
  * skipped), DQT (8- and 16-bit precision), DHT (canonical Huffman
  * from BITS/HUFFVAL), SOF0/SOF1/SOF2 frames (8-bit precision, gray
  * or YCbCr, sampling factors up to 4), DRI + RSTn restart handling,
  * the entropy-coded segment with 0xFF00 byte stuffing, and the full
  * multi-scan engine over per-component coefficient buffers:
  * baseline's single DC+AC scan, progressive DC-first/DC-refine
  * (interleaved or not) and AC-first/AC-refine band scans with EOBRUN
  * and the successive-approximation correction-bit algorithm (annex
  * G). Reconstruction: dequantize through the zigzag order, the
  * exact-definition separable float 8×8 inverse DCT, box (nearest)
  * chroma upsampling, JFIF YCbCr→RGB. Arithmetic coding,
  * hierarchical modes, 12-bit precision and CMYK are rejected
  * LOUDLY — never mis-decoded.
  *
  * Two sanctioned differences from libjpeg-family decoders (asserted
  * within tolerance against the JDK's ImageIO in the spec): the IDCT
  * is the exact-definition float transform (theirs is a scaled
  * integer approximation, ±1/pixel), and chroma upsampling is box
  * replication (theirs defaults to a triangle filter, which differs
  * near chroma edges only). Decoding is row-local like every codec
  * here — payloads decode inside the scan stage. The coefficient
  * buffer costs ~8 bytes/pixel during decode (the price of
  * progressive's multi-pass structure; libjpeg pays the same).
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
    var sawMarker = -1 // a real marker reached through the bit feed

    def align(): Unit = { buf = 0; cnt = 0 }

    /** Next bit of the entropy-coded segment; 0xFF00 unstuffs to 0xFF;
      * a real marker ends the segment (pos stays AT its 0xFF). */
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length)
          throw new IllegalArgumentException("truncated JPEG scan")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val b2 = if (pos < data.length) data(pos) & 0xff else 0xd9
          if (b2 == 0x00) pos += 1 // stuffed
          else { sawMarker = b2; b = 0; pos -= 1 } // feed zeros past EOB
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

    /** Discard pad bits and consume an RSTn marker. */
    def consumeRestart(): Unit = {
      align()
      var p = pos
      while (p + 1 < data.length && (data(p) & 0xff) == 0xff &&
          (data(p + 1) & 0xff) == 0xff) p += 1 // fill bytes
      require(p + 1 < data.length && (data(p) & 0xff) == 0xff,
        "missing RST marker")
      val m = data(p + 1) & 0xff
      require(m >= 0xd0 && m <= 0xd7, f"expected RST, got FF$m%02X")
      pos = p + 2
      sawMarker = -1
    }

    /** End-of-scan: discard pad bits; pos now sits at the next marker. */
    def finishScan(): Int = {
      align()
      sawMarker = -1
      pos
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an n-bit magnitude to its signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private final class Comp(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcTable = 0
    var acTable = 0
    var pred = 0
    // raw (undequantized) coefficients in ZIGZAG order, 64 per block,
    // MCU-padded layout blocksX × blocksY
    var coefs: Array[Int] = null
    var blocksX = 0
    var blocksY = 0
    // non-interleaved scan coverage (the component's OWN dimensions)
    var ownBlocksX = 0
    var ownBlocksY = 0
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
    var maxH = 1; var maxV = 1
    var restartInterval = 0
    var scans = 0
    var done = false

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

    while (!done) {
      require(pos + 2 <= bytes.length, "truncated JPEG: marker")
      require((bytes(pos) & 0xff) == 0xff, f"JPEG marker sync at $pos")
      var m = bytes(pos + 1) & 0xff
      pos += 2
      while (m == 0xff) { m = bytes(pos) & 0xff; pos += 1 } // fill bytes
      m match {
        case 0xd9 => // EOI
          require(scans > 0, "JPEG EOI before any scan")
          done = true
        case 0x01 => () // TEM, standalone
        case rst if rst >= 0xd0 && rst <= 0xd7 => ()
        case 0xc0 | 0xc1 | 0xc2 => // baseline / ext. sequential / progressive
          require(comps == null, "multiple JPEG frames")
          val len = seg(pos)
          val prec = bytes(pos + 2) & 0xff
          require(prec == 8, s"unsupported JPEG precision $prec")
          height = u16(pos + 3)
          width = u16(pos + 5)
          require(width > 0 && height > 0, s"bad frame ${width}x$height")
          require(width.toLong * height <= (1L << 28),
            s"implausible JPEG dims ${width}x$height")
          val nc = bytes(pos + 7) & 0xff
          require(nc == 1 || nc == 3,
            s"unsupported JPEG component count $nc (gray/YCbCr only)")
          comps = Array.tabulate(nc) { c =>
            val off = pos + 8 + 3 * c
            val hv = bytes(off + 1) & 0xff
            new Comp(bytes(off) & 0xff, hv >> 4, hv & 15, bytes(off + 2) & 0xff)
          }
          comps.foreach(c => require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
            s"bad sampling ${c.h}x${c.v}"))
          maxH = comps.map(_.h).max
          maxV = comps.map(_.v).max
          val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
          val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
          comps.foreach { c =>
            c.blocksX = mcusX * c.h
            c.blocksY = mcusY * c.v
            c.coefs = new Array[Int](c.blocksX * c.blocksY * 64)
            c.ownBlocksX = ((width * c.h + maxH - 1) / maxH + 7) / 8
            c.ownBlocksY = ((height * c.v + maxV - 1) / maxV + 7) / 8
          }
          pos += len
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
              t(i) = if (pq == 0) bytes(p + i) & 0xff else u16(p + 2 * i)
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
        case 0xda => // SOS
          require(comps != null, "JPEG SOS before SOF")
          val len = seg(pos)
          val ns = bytes(pos + 2) & 0xff
          require(ns >= 1 && ns <= comps.length, s"scan components $ns")
          val scanComps = new Array[Comp](ns)
          var p = pos + 3
          for (i <- 0 until ns) {
            val cid = bytes(p) & 0xff
            val tt = bytes(p + 1) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"SOS component $cid"))
            c.dcTable = tt >> 4
            c.acTable = tt & 15
            scanComps(i) = c
            p += 2
          }
          val ss = bytes(p) & 0xff
          val se = bytes(p + 1) & 0xff
          val aa = bytes(p + 2) & 0xff
          val ah = aa >> 4
          val al = aa & 15
          pos += len
          pos = decodeScan(bytes, pos, scanComps, dcHuff, acHuff,
            maxH, maxV, width, height, restartInterval, ss, se, ah, al)
          scans += 1
        case _ => // APPn, COM, and anything else with a length
          pos += seg(pos)
      }
    }
    reconstruct(comps, qt, width, height, maxH, maxV)
  }

  /** One entropy-coded scan into the coefficient buffers; returns the
    * position of the next marker. Handles all four progressive scan
    * kinds plus the baseline full scan (Ss=0, Se=63, Ah=0). */
  private def decodeScan(bytes: Array[Byte], start: Int,
      scanComps: Array[Comp], dcHuff: Array[Huff], acHuff: Array[Huff],
      maxH: Int, maxV: Int, width: Int, height: Int,
      restartInterval: Int, ss: Int, se: Int, ah: Int, al: Int): Int = {
    require(ss >= 0 && se <= 63 && ss <= se, s"scan band $ss..$se")
    require(ss == 0 || scanComps.length == 1,
      "progressive AC scan must be single-component")
    val br = new BitReader(bytes, start)
    var eobrun = 0
    scanComps.foreach(_.pred = 0)

    def refineBit(c: Comp, off: Int): Unit = {
      val cur = c.coefs(off)
      if (br.bit() == 1) {
        val p1 = 1 << al
        if ((cur & p1) == 0)
          c.coefs(off) = if (cur >= 0) cur + p1 else cur - p1
      }
    }

    def decodeBlock(c: Comp, bx: Int, by: Int): Unit = {
      val off = (by * c.blocksX + bx) * 64
      if (ss == 0) { // DC (or baseline full) scan
        if (ah == 0) {
          val dc = dcHuff(c.dcTable)
          require(dc != null, s"missing DC table ${c.dcTable}")
          val t = br.decode(dc)
          require(t <= 11, s"DC category $t")
          c.pred += extend(br.receive(t), t)
          c.coefs(off) = c.pred << al
        } else {
          if (br.bit() == 1) c.coefs(off) |= 1 << al
        }
        if (se == 0) return // progressive DC-only scan
        // baseline: fall through to AC with Ah=Al=0
        val ac = acHuff(c.acTable)
        require(ac != null, s"missing AC table ${c.acTable}")
        var k = 1
        var blockDone = false
        while (!blockDone && k <= se) {
          val rs = br.decode(ac)
          val r = rs >> 4
          val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else blockDone = true // EOB
          } else {
            k += r
            require(k <= se, "AC index overflow")
            c.coefs(off + k) = extend(br.receive(s), s)
            k += 1
          }
        }
      } else if (ah == 0) { // AC first scan (with EOBRUN)
        if (eobrun > 0) { eobrun -= 1; return }
        val ac = acHuff(c.acTable)
        require(ac != null, s"missing AC table ${c.acTable}")
        var k = ss
        var blockDone = false
        while (!blockDone && k <= se) {
          val rs = br.decode(ac)
          val r = rs >> 4
          val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += br.receive(r)
              blockDone = true
            }
          } else {
            k += r
            require(k <= se, "AC index overflow")
            c.coefs(off + k) = extend(br.receive(s), s) << al
            k += 1
          }
        }
      } else { // AC refinement scan (annex G.1.2.3 correction bits)
        val p1 = 1 << al
        val m1 = -1 << al
        var k = ss
        if (eobrun == 0) {
          val ac = acHuff(c.acTable)
          require(ac != null, s"missing AC table ${c.acTable}")
          var inBand = true
          while (inBand && k <= se) {
            val rs = br.decode(ac)
            var r = rs >> 4
            val s = rs & 15
            var newval = 0
            if (s == 0) {
              if (r != 15) {
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += br.receive(r)
                inBand = false // refine the rest under the EOB run below
              }
              // r == 15 (ZRL): skip 16 zero-history positions
            } else {
              require(s == 1, s"AC refine size $s")
              newval = if (br.bit() == 1) p1 else m1
            }
            if (inBand) {
              var advancing = true
              while (advancing && k <= se) {
                if (c.coefs(off + k) != 0) { refineBit(c, off + k); k += 1 }
                else if (r == 0) advancing = false
                else { r -= 1; k += 1 }
              }
              if (newval != 0 && k <= se) c.coefs(off + k) = newval
              k += 1
            }
          }
        } else eobrun -= 1
        // under an EOB run (or after starting one): only correction
        // bits for already-nonzero coefficients remain in this block
        while (k <= se) {
          if (c.coefs(off + k) != 0) refineBit(c, off + k)
          k += 1
        }
      }
    }

    val interleaved = scanComps.length > 1
    val (unitsX, unitsY) =
      if (interleaved)
        ((width + 8 * maxH - 1) / (8 * maxH),
          (height + 8 * maxV - 1) / (8 * maxV))
      else (scanComps(0).ownBlocksX, scanComps(0).ownBlocksY)
    val totalUnits = unitsX * unitsY
    var unit = 0
    while (unit < totalUnits) {
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.consumeRestart()
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }
      val uy = unit / unitsX
      val ux = unit % unitsX
      if (interleaved) {
        scanComps.foreach { c =>
          var v = 0
          while (v < c.v) {
            var h = 0
            while (h < c.h) {
              decodeBlock(c, ux * c.h + h, uy * c.v + v)
              h += 1
            }
            v += 1
          }
        }
      } else decodeBlock(scanComps(0), ux, uy)
      unit += 1
    }
    br.finishScan()
  }

  /** Dequantize + IDCT every block, assemble planes, upsample (box)
    * and color-transform. */
  private def reconstruct(comps: Array[Comp], qt: Array[Array[Int]],
      width: Int, height: Int, maxH: Int, maxV: Int): Png.Image = {
    require(comps != null, "JPEG missing SOF frame")
    val planes = comps.map { c =>
      val q = qt(c.tq)
      require(q != null, s"missing quant table ${c.tq}")
      val planeW = c.blocksX * 8
      val plane = new Array[Byte](planeW * c.blocksY * 8)
      val nat = new Array[Int](64)
      val blk = new Array[Byte](64)
      var by = 0
      while (by < c.blocksY) {
        var bx = 0
        while (bx < c.blocksX) {
          val off = (by * c.blocksX + bx) * 64
          var k = 0
          while (k < 64) { nat(Zigzag(k)) = c.coefs(off + k) * q(k); k += 1 }
          idct(nat, blk)
          var y = 0
          while (y < 8) {
            System.arraycopy(blk, y * 8, plane,
              (by * 8 + y) * planeW + bx * 8, 8)
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      (plane, planeW)
    }
    if (comps.length == 1) {
      val (plane, planeW) = planes(0)
      val px = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(plane, y * planeW, px, y * width, width)
        y += 1
      }
      Png.Image(width, height, 1, px)
    } else {
      val (py, wy) = planes(0)
      val (pb, wb) = planes(1)
      val (pr, wr) = planes(2)
      val Array(cy, cb, cr) = comps
      val px = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val yY = y * cy.v / maxV
        val yB = y * cb.v / maxV
        val yR = y * cr.v / maxV
        var x = 0
        while (x < width) {
          val lum = py(yY * wy + x * cy.h / maxH) & 0xff
          val b = (pb(yB * wb + x * cb.h / maxH) & 0xff) - 128
          val r = (pr(yR * wr + x * cr.h / maxH) & 0xff) - 128
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
