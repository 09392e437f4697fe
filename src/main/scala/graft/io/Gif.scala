package graft.io

import java.io.ByteArrayOutputStream

/** From-scratch GIF codec (GIF87a/GIF89a) — the VIDEO-shaped member of
  * the real-codec family: an animated GIF is the smallest real
  * container with multiple timed frames, so frame sampling finally
  * operates on an actual decoded animation rather than a synthetic
  * byte stream.
  *
  * Decode implements the public specification: header + logical screen
  * descriptor, global/local color tables, extension blocks (the
  * graphic-control extension's disposal method and transparency index
  * are honored; others are skipped via their sub-block chains), image
  * descriptors with interlacing (the 4-pass row order), variable-width
  * LZW decompression (clear/EOI codes, dictionary growth to 4096),
  * and frame COMPOSITION onto the logical screen: disposal 0/1 leave
  * the canvas, 2 restores the background, 3 restores the previous
  * canvas. Frames are emitted as composited RGB [[Png.Image]]s — what
  * a viewer shows after each frame.
  *
  * Encode writes animated GIF89a with a caller-supplied global
  * palette. The LZW stream uses the spec's escape hatch of emitting a
  * CLEAR code before every pixel code — no compression, but simple,
  * valid and decodable by any conforming reader (including this one
  * and the JDK's, which the spec cross-checks); the round-trip query
  * path only needs losslessness, not ratio.
  */
object Gif {

  /** One composited animation frame + its delay in centiseconds. */
  case class Frame(image: Png.Image, delayCs: Int)

  // ---- decode ----------------------------------------------------------

  def decode(bytes: Array[Byte]): Seq[Frame] = {
    require(bytes.length >= 13, "truncated GIF header")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: '$sig'")
    def u16(off: Int): Int = {
      require(off + 2 <= bytes.length, "truncated GIF")
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    }
    val width = u16(6)
    val height = u16(8)
    require(width >= 1 && height >= 1 && width.toLong * height <= (1L << 26),
      s"implausible GIF dims ${width}x$height")
    val flags = bytes(10) & 0xff
    val bgIndex = bytes(11) & 0xff
    var pos = 13
    val gct: Array[Byte] =
      if ((flags & 0x80) != 0) {
        val n = 2 << (flags & 7)
        val t = java.util.Arrays.copyOfRange(bytes, pos, pos + n * 3)
        pos += n * 3
        t
      } else null

    // canvas state (RGB + coverage), background = transparent black
    val canvas = new Array[Byte](width * height * 3)
    var prevCanvas: Array[Byte] = null
    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    var transparentIdx = -1
    var disposal = 0
    var delayCs = 0
    var done = false

    def skipSubBlocks(): Unit = {
      var n = bytes(pos) & 0xff
      pos += 1
      while (n != 0) {
        pos += n
        require(pos < bytes.length, "truncated GIF sub-blocks")
        n = bytes(pos) & 0xff
        pos += 1
      }
    }

    while (!done) {
      require(pos < bytes.length, "truncated GIF: missing trailer")
      val block = bytes(pos) & 0xff
      pos += 1
      block match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension
          require(pos < bytes.length, "truncated GIF extension")
          val label = bytes(pos) & 0xff
          pos += 1
          if (label == 0xf9) { // graphic control
            val sz = bytes(pos) & 0xff
            require(sz == 4, s"GCE size $sz")
            val packed = bytes(pos + 1) & 0xff
            disposal = (packed >> 2) & 7
            delayCs = u16(pos + 2)
            transparentIdx =
              if ((packed & 1) != 0) bytes(pos + 4) & 0xff else -1
            pos += 1 + sz
            require((bytes(pos) & 0xff) == 0, "GCE missing terminator")
            pos += 1
          } else skipSubBlocks()
        case 0x2c => // image descriptor
          val fx = u16(pos); val fy = u16(pos + 2)
          val fw = u16(pos + 4); val fh = u16(pos + 6)
          val fflags = bytes(pos + 8) & 0xff
          pos += 9
          require(fw >= 1 && fh >= 1 && fx + fw <= width && fy + fh <= height,
            s"GIF frame ${fw}x$fh@$fx,$fy outside ${width}x$height")
          val interlaced = (fflags & 0x40) != 0
          val lct: Array[Byte] =
            if ((fflags & 0x80) != 0) {
              val n = 2 << (fflags & 7)
              val t = java.util.Arrays.copyOfRange(bytes, pos, pos + n * 3)
              pos += n * 3
              t
            } else null
          val palette = if (lct != null) lct else gct
          require(palette != null, "GIF frame with no color table")
          // LZW data: min code size + sub-blocks
          val minCode = bytes(pos) & 0xff
          pos += 1
          require(minCode >= 1 && minCode <= 11, s"LZW min code $minCode")
          val data = new ByteArrayOutputStream()
          var n = bytes(pos) & 0xff
          pos += 1
          while (n != 0) {
            require(pos + n <= bytes.length, "truncated GIF image data")
            data.write(bytes, pos, n)
            pos += n
            n = bytes(pos) & 0xff
            pos += 1
          }
          val indices = lzwDecode(data.toByteArray, minCode, fw * fh)
          // save canvas for disposal 3
          val before = if (disposal == 3) canvas.clone() else null
          // paint with row order (interlace 4-pass)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(fh)(identity)
            else {
              val rows = scala.collection.mutable.ArrayBuffer.empty[Int]
              var r = 0
              while (r < fh) { rows += r; r += 8 } // pass 1
              r = 4
              while (r < fh) { rows += r; r += 8 } // pass 2
              r = 2
              while (r < fh) { rows += r; r += 4 } // pass 3
              r = 1
              while (r < fh) { rows += r; r += 2 } // pass 4
              rows.toArray
            }
          var src = 0
          rowOrder.foreach { ry =>
            var x = 0
            while (x < fw) {
              val idx = indices(src) & 0xff
              src += 1
              if (idx != transparentIdx) {
                require(idx * 3 + 2 < palette.length, s"palette index $idx")
                val o = ((fy + ry) * width + (fx + x)) * 3
                canvas(o) = palette(idx * 3)
                canvas(o + 1) = palette(idx * 3 + 1)
                canvas(o + 2) = palette(idx * 3 + 2)
              }
              x += 1
            }
          }
          frames += Frame(
            Png.Image(width, height, 3, canvas.clone()), delayCs)
          // apply disposal for the NEXT frame
          disposal match {
            case 2 => // restore background: clear the frame rect
              val bg = new Array[Byte](3)
              if (gct != null && transparentIdx < 0 &&
                  bgIndex * 3 + 2 < gct.length) {
                bg(0) = gct(bgIndex * 3)
                bg(1) = gct(bgIndex * 3 + 1)
                bg(2) = gct(bgIndex * 3 + 2)
              }
              var ry = 0
              while (ry < fh) {
                var x = 0
                while (x < fw) {
                  val o = ((fy + ry) * width + (fx + x)) * 3
                  canvas(o) = bg(0); canvas(o + 1) = bg(1); canvas(o + 2) = bg(2)
                  x += 1
                }
                ry += 1
              }
            case 3 if before != null =>
              System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => () // 0/1: leave as painted
          }
          prevCanvas = before
          transparentIdx = -1
          disposal = 0
          delayCs = 0
        case other =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$other%02X")
      }
    }
    require(frames.nonEmpty, "GIF with no image data")
    frames.toSeq
  }

  /** Variable-width GIF-LZW decode of `n` pixel indices. */
  private def lzwDecode(data: Array[Byte], minCode: Int, n: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](n)
    var outPos = 0
    // dictionary as (prefix code, appended byte); first byte cached
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val first = new Array[Byte](4096)
    var dictSize = eoi + 1
    var codeWidth = minCode + 1
    var prevCode = -1
    var bitPos = 0
    val totalBits = data.length * 8

    def readCode(): Int = {
      if (bitPos + codeWidth > totalBits) return eoi // ran out: treat as end
      var v = 0
      var i = 0
      while (i < codeWidth) {
        val b = bitPos + i
        if ((data(b >> 3) & (1 << (b & 7))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeWidth
      v
    }

    val stack = new Array[Byte](4096) // shared chain buffer (hot path)
    def emit(code: Int): Byte = {
      // walk the chain into the shared temp, then reverse-emit
      var c = code
      var sp = 0
      while (c >= clear + 2) {
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      val head = c.toByte // a literal
      if (outPos < n) { out(outPos) = head; outPos += 1 }
      while (sp > 0 && outPos < n) {
        sp -= 1
        out(outPos) = stack(sp); outPos += 1
      }
      head
    }

    var stop = false
    while (!stop && outPos < n) {
      val code = readCode()
      if (code == eoi) stop = true
      else if (code == clear) {
        dictSize = eoi + 1
        codeWidth = minCode + 1
        prevCode = -1
      } else {
        require(code < dictSize || (code == dictSize && prevCode >= 0),
          s"bad LZW code $code (dict $dictSize)")
        if (prevCode < 0) {
          require(code < clear, s"first LZW code $code not a literal")
          emit(code)
          prevCode = code
        } else {
          val headByte =
            if (code < dictSize) {
              val h = emit(code)
              h
            } else { // the KwKwK case: prev + first(prev)
              val f = if (prevCode < clear) prevCode.toByte else first(prevCode)
              // temporarily register, then emit
              prefix(dictSize) = prevCode
              suffix(dictSize) = f
              first(dictSize) = if (prevCode < clear) prevCode.toByte else first(prevCode)
              emit(code) // code == dictSize, now defined
            }
          if (code < dictSize && dictSize < 4096) {
            prefix(dictSize) = prevCode
            suffix(dictSize) = headByte
            first(dictSize) =
              if (prevCode < clear) prevCode.toByte else first(prevCode)
          }
          if (dictSize < 4096) {
            dictSize += 1
            if (dictSize == (1 << codeWidth) && codeWidth < 12)
              codeWidth += 1
          }
          prevCode = code
        }
      }
    }
    require(outPos == n, s"LZW produced $outPos of $n pixels")
    out
  }

  // ---- encode ----------------------------------------------------------

  /** Animated GIF89a from index frames over one global `palette`
    * (RGB triples, power-of-two entry count ≤ 256). Each frame covers
    * the full canvas, disposal "leave". */
  def encode(width: Int, height: Int, palette: Array[Byte],
      frames: Seq[(Array[Byte], Int)]): Array[Byte] = {
    require(palette.length % 3 == 0, "palette size")
    val entries = palette.length / 3
    require(entries >= 2 && entries <= 256 && (entries & (entries - 1)) == 0,
      s"palette entries $entries must be a power of two in [2, 256]")
    require(frames.nonEmpty, "no frames")
    frames.foreach { case (px, _) =>
      require(px.length == width * height, "frame size")
      px.foreach(p => require((p & 0xff) < entries, s"index ${p & 0xff}"))
    }
    val bits = math.max(2, 32 - Integer.numberOfLeadingZeros(entries - 1))
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    out.write(0x80 | (bits - 1)) // GCT present, size
    out.write(0) // background index
    out.write(0) // aspect
    out.write(palette, 0, palette.length)
    frames.foreach { case (px, delayCs) =>
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0) // disposal leave, no transparency
      le16(delayCs)
      out.write(0) // transparent index (unused)
      out.write(0) // terminator
      out.write(0x2c)
      le16(0); le16(0); le16(width); le16(height)
      out.write(0) // no LCT, not interlaced
      val minCode = math.max(bits, 2)
      out.write(minCode)
      writeLzw(out, px, minCode)
      out.write(0) // data terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Encoder dictionary: open-addressing hash from (prefix code,
    * appended byte) — a 20-bit key — to the sequence's code. Table
    * size 8192 keeps load ≤ 0.5 at the 4096-code cap; generation
    * stamps make CLEAR an O(1) bump instead of an array fill, and the
    * whole structure is thread-local so the per-frame hot path
    * ([[graft.expressions.GifEncode]] inside a projection) allocates
    * nothing. */
  private final class LzwEncState {
    val keys = new Array[Int](8192)
    val vals = new Array[Int](8192)
    val gens = new Array[Long](8192)
    var gen = 0L
    def clearDict(): Unit = gen += 1 // Long: an Int counter wraps after 2^31 CLEARs on one long-lived thread and stale slots would silently match
    /** code of `key`, or -(slot+1) where it should be inserted. */
    def find(key: Int): Int = {
      var i = (key * -1640531527) >>> 19 // Fibonacci hash → 13 bits
      while (true) {
        if (gens(i) != gen) return -(i + 1)
        if (keys(i) == key) return vals(i)
        i = (i + 1) & 8191
      }
      -1 // unreachable
    }
    def insert(slot: Int, key: Int, code: Int): Unit = {
      gens(slot) = gen; keys(slot) = key; vals(slot) = code
    }
  }
  private val localEnc = ThreadLocal.withInitial(() => new LzwEncState)

  /** Real variable-width LZW compression (GIF89a appendix F — the
    * exact inverse of [[lzwDecode]]): grow the dictionary one sequence
    * per emitted code, widen the code size when the next free code
    * crosses a power of two (same deferred timing as the decoder's
    * `dictSize == 1 << codeWidth` bump), and emit CLEAR + reset when
    * the 4096-code space is exhausted so long streams stay adaptive. */
  private def writeLzw(out: ByteArrayOutputStream, px: Array[Byte],
      minCode: Int): Unit = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val bits = new ByteArrayOutputStream(px.length / 2 + 16)
    var acc = 0L
    var nAcc = 0
    var codeWidth = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nAcc
      nAcc += codeWidth
      while (nAcc >= 8) {
        bits.write((acc & 0xff).toInt)
        acc >>>= 8
        nAcc -= 8
      }
    }
    val st = localEnc.get()
    st.clearDict()
    var nextCode = eoi + 1
    put(clear)
    if (px.nonEmpty) {
      var prev = px(0) & 0xff // code of the current (matched) sequence
      var i = 1
      while (i < px.length) {
        val b = px(i) & 0xff
        val key = (prev << 8) | b
        val f = st.find(key)
        if (f >= 0) prev = f
        else {
          put(prev)
          if (nextCode < 4096) {
            st.insert(-f - 1, key, nextCode)
            nextCode += 1
            // decoder bumps when its dictSize reaches 1<<codeWidth;
            // its dictSize trails nextCode by one registration
            if (nextCode == (1 << codeWidth) + 1 && codeWidth < 12)
              codeWidth += 1
          } else { // dictionary full: reset so the stream stays adaptive
            put(clear)
            st.clearDict()
            nextCode = eoi + 1
            codeWidth = minCode + 1
          }
          prev = b
        }
        i += 1
      }
      put(prev)
    }
    put(eoi)
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    val data = bits.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
  }
}
