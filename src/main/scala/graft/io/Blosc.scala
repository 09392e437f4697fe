package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** c-blosc (blosc1) frame codec, from scratch against the published
  * format (c-blosc `README_HEADER.rst`): the DEFAULT compressor of
  * xarray's zarr backend (numcodecs `Blosc(cname="lz4", clevel=5,
  * shuffle=SHUFFLE)`), so a stock `ds.to_zarr(path)` from the
  * reference's stack (wrf_to_geodataframe holds model output in
  * xarray Datasets) produces stores framed this way.
  *
  * Frame layout (all multi-byte ints little-endian):
  * {{{
  *   byte  0      format version
  *   byte  1      codec sub-version
  *   byte  2      flags: 0x01 byte-shuffle, 0x02 pure-memcpy,
  *                0x04 bit-shuffle, 0x10 blocks-not-split,
  *                bits 5-7 codec (0 blosclz, 1 lz4/lz4hc, 2 snappy,
  *                3 zlib, 4 zstd)
  *   byte  3      typesize
  *   bytes 4-7    nbytes   (uncompressed length)
  *   bytes 8-11   blocksize
  *   bytes 12-15  cbytes   (whole frame length, header included)
  * }}}
  * After the header: pure-memcpy frames carry the raw bytes verbatim;
  * otherwise a table of `nblocks` uint32 offsets (from frame start),
  * one per block of `blocksize` bytes (last block = remainder). Each
  * block holds `nsplits` streams — `typesize` of them when the block
  * was split (typesize <= 16, blocksize divisible by typesize, not
  * the leftover block, split flag clear), else one — each stream a
  * uint32 compressed length followed by its payload, stored RAW when
  * that length equals the stream's uncompressed length. Byte-shuffle
  * transposes each block into `typesize` byte planes before
  * compression (trailing `blocksize % typesize` bytes copied as-is).
  *
  * Codecs: lz4 block format via the lz4-java shipped with Spark,
  * zlib via `java.util.zip`, zstd via the zstd-jni shipped with
  * Spark, snappy raw-block via snappy-java. blosclz (c-blosc's own
  * LZ77, only produced when a writer opts OUT of the numcodecs
  * default) and bit-shuffle raise loudly rather than misread.
  *
  * Hostile-bytes posture matches [[Zarr.inflate]]/[[Png]]: every
  * length and offset is bounds-checked with a catchable require, the
  * output allocation is capped by the caller's expected length, and
  * decode never loops without progress.
  */
object Blosc {

  private val DoShuffle = 0x01
  private val MemCpyed = 0x02
  private val DoBitShuffle = 0x04
  private val DontSplit = 0x10
  private val MaxSplits = 16

  private def lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()

  // ---------------------------------------------------------- decode

  /** Decode one blosc1 frame. `expectedLen` (>= 0) pins the allocation
    * to what the caller knows the chunk must hold — a crafted header
    * cannot demand a multi-GB buffer; pass -1 to trust the header up
    * to a 512 MB cap (fixture tooling only). */
  def decompress(frame: Array[Byte], expectedLen: Int = -1): Array[Byte] = {
    require(frame.length >= 16, s"blosc frame of ${frame.length} bytes")
    val hdr = ByteBuffer.wrap(frame, 0, 16).order(ByteOrder.LITTLE_ENDIAN)
    hdr.position(2)
    val flags = hdr.get() & 0xff
    val typesize = hdr.get() & 0xff
    val nbytes = hdr.getInt()
    val blocksize = hdr.getInt()
    val cbytes = hdr.getInt()
    require(nbytes >= 0 && (expectedLen < 0 || nbytes == expectedLen),
      s"blosc nbytes $nbytes, caller expects $expectedLen")
    require(expectedLen >= 0 || nbytes <= (1 << 29),
      s"blosc nbytes $nbytes exceeds the unpinned 512 MB cap")
    require(cbytes == frame.length,
      s"blosc cbytes $cbytes != frame length ${frame.length}")
    if (nbytes == 0) return Array.emptyByteArray
    val out = new Array[Byte](nbytes)
    if ((flags & MemCpyed) != 0) {
      // incompressible fallback: raw bytes verbatim, shuffle flags moot
      require(frame.length == nbytes + 16,
        s"blosc memcpy frame ${frame.length} != ${nbytes + 16}")
      System.arraycopy(frame, 16, out, 0, nbytes)
      return out
    }
    require((flags & DoBitShuffle) == 0,
      "blosc bit-shuffle filter not supported (byte-shuffle or none only)")
    val codec = (flags >> 5) & 0x7
    require(blocksize > 0, s"blosc blocksize $blocksize")
    // c-blosc clamps blocksize to nbytes when computing it, so any
    // frame claiming more is malformed — and without this bound the
    // shuffle scratch buffer below would be allocated straight from
    // the untrusted header (a crafted blocksize near Int.MaxValue is
    // a ~2 GB allocation before any stream check, the same
    // fatal-OOM-in-scan-task class the HDF5 attribute guard closes).
    require(blocksize <= nbytes,
      s"blosc blocksize $blocksize exceeds nbytes $nbytes")
    val nblocks = ((nbytes.toLong + blocksize - 1) / blocksize).toInt
    require(16L + 4L * nblocks <= frame.length,
      s"blosc offset table of $nblocks entries overruns the frame")
    val bstarts = ByteBuffer.wrap(frame, 16, 4 * nblocks)
      .order(ByteOrder.LITTLE_ENDIAN)
    val shuffled = (flags & DoShuffle) != 0 && typesize > 1
    val tmp = if (shuffled) new Array[Byte](blocksize) else null
    var b = 0
    while (b < nblocks) {
      val bsize = math.min(blocksize, nbytes - b * blocksize)
      val leftover = bsize != blocksize
      var src = bstarts.getInt(16 + 4 * b)
      require(src >= 16 && src <= frame.length,
        s"blosc block $b offset $src outside the frame")
      // mirror of the writer's split rule — the flag records the choice
      val nsplits =
        if (typesize <= MaxSplits && typesize > 0 && bsize % typesize == 0 &&
          !leftover && (flags & DontSplit) == 0) typesize
        else 1
      val neblock = bsize / nsplits
      val dest = if (shuffled) tmp else out
      val destBase = if (shuffled) 0 else b * blocksize
      var j = 0
      while (j < nsplits) {
        require(src + 4 <= frame.length, s"blosc stream $b/$j header overruns")
        val clen = ByteBuffer.wrap(frame, src, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt()
        src += 4
        // long arithmetic: a hostile clen near Int.MaxValue must not
        // wrap the sum negative and sail past this guard into the
        // native decoders (zstd-jni/snappy do the same overflowing
        // int check internally — the require is the only safe gate)
        require(clen > 0 && src.toLong + clen <= frame.length,
          s"blosc stream $b/$j of $clen bytes overruns the frame")
        if (clen == neblock) { // stored raw: compression gained nothing
          System.arraycopy(frame, src, dest, destBase + j * neblock, neblock)
        } else {
          decodeStream(codec, frame, src, clen, dest,
            destBase + j * neblock, neblock)
        }
        src += clen
        j += 1
      }
      if (shuffled) unshuffle(typesize, bsize, tmp, out, b * blocksize)
      b += 1
    }
    out
  }

  private def decodeStream(codec: Int, src: Array[Byte], off: Int, len: Int,
      dest: Array[Byte], destOff: Int, destLen: Int): Unit = codec match {
    case 1 => // lz4 / lz4hc share the block format
      val n = lz4.safeDecompressor()
        .decompress(src, off, len, dest, destOff, destLen)
      require(n == destLen, s"blosc lz4 stream yielded $n of $destLen bytes")
    case 3 =>
      val inf = new java.util.zip.Inflater()
      try { // finally-end: a throwing decode must not leak native zlib state
        inf.setInput(src, off, len)
        var at = destOff
        val end = destOff + destLen
        while (!inf.finished() && at < end) {
          val n = inf.inflate(dest, at, end - at)
          if (n == 0) {
            require(!inf.needsDictionary && !inf.needsInput,
              "truncated blosc zlib stream")
            throw new IllegalArgumentException("stalled blosc zlib stream")
          }
          at += n
        }
        require(at == end, s"blosc zlib stream yielded ${at - destOff} of $destLen")
      } finally inf.end()
    case 4 =>
      val n = com.github.luben.zstd.Zstd.decompressByteArray(
        dest, destOff, destLen, src, off, len)
      require(n == destLen, s"blosc zstd stream yielded $n of $destLen bytes")
    case 2 =>
      val n = org.xerial.snappy.Snappy.uncompress(src, off, len, dest, destOff)
      require(n == destLen, s"blosc snappy stream yielded $n of $destLen bytes")
    case 0 => throw new IllegalArgumentException(
      "blosc blosclz codec not supported (lz4/zlib/zstd/snappy only)")
    case other => throw new IllegalArgumentException(s"blosc codec id $other")
  }

  // ---------------------------------------------------------- encode

  /** Encode one blosc1 frame the way numcodecs' default writes chunks:
    * lz4 streams, byte-shuffle when `typesize > 1`, blocks split into
    * per-byte-plane streams where the format allows. Falls back to a
    * pure-memcpy frame when compression gains nothing. */
  def compress(raw: Array[Byte], typesize: Int, shuffle: Boolean = true): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"blosc typesize $typesize")
    val nbytes = raw.length
    // numcodecs-scale block: small enough to split well, large enough
    // to amortize stream headers; always a typesize multiple so split
    // mode engages on full blocks
    val blocksize =
      if (nbytes == 0) 0
      else math.min(nbytes.toLong, math.max(typesize, (1 << 17) / typesize * typesize).toLong).toInt
    val doShuffle = shuffle && typesize > 1
    val split = typesize <= MaxSplits && blocksize % typesize == 0
    var flags = (1 << 5) | (if (doShuffle) DoShuffle else 0) |
      (if (split) 0 else DontSplit)
    val nblocks = if (nbytes == 0) 0 else (nbytes + blocksize - 1) / blocksize
    val comp = lz4.fastCompressor()
    val body = new java.io.ByteArrayOutputStream(nbytes / 2 + 64)
    val bstarts = new Array[Int](nblocks)
    val tmp = if (doShuffle) new Array[Byte](blocksize) else null
    var b = 0
    while (b < nblocks) {
      bstarts(b) = 16 + 4 * nblocks + body.size()
      val bsize = math.min(blocksize, nbytes - b * blocksize)
      val leftover = bsize != blocksize
      val blockSrc =
        if (doShuffle) { shuffleBlock(typesize, bsize, raw, b * blocksize, tmp); tmp }
        else raw
      val blockOff = if (doShuffle) 0 else b * blocksize
      val nsplits = if (split && !leftover) typesize else 1
      val neblock = bsize / nsplits
      var j = 0
      while (j < nsplits) {
        val czMax = comp.maxCompressedLength(neblock)
        val cz = new Array[Byte](czMax)
        val clen = comp.compress(blockSrc, blockOff + j * neblock, neblock, cz, 0, czMax)
        val hdr = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        if (clen >= neblock) { // raw stream: marked by clen == neblock
          hdr.putInt(neblock)
          body.write(hdr.array())
          body.write(blockSrc, blockOff + j * neblock, neblock)
        } else {
          hdr.putInt(clen)
          body.write(hdr.array())
          body.write(cz, 0, clen)
        }
        j += 1
      }
      b += 1
    }
    val framed = 16 + 4 * nblocks + body.size()
    if (framed >= nbytes + 16) { // incompressible: memcpy frame
      flags = (1 << 5) | MemCpyed
      val out = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      out.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
      out.putInt(nbytes).putInt(blocksize).putInt(16 + nbytes)
      out.put(raw)
      return out.array()
    }
    val out = ByteBuffer.allocate(framed).order(ByteOrder.LITTLE_ENDIAN)
    out.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    out.putInt(nbytes).putInt(blocksize).putInt(framed)
    bstarts.foreach(out.putInt)
    out.put(body.toByteArray)
    out.array()
  }

  // --------------------------------------------------------- shuffle

  /** Byte-shuffle one block: `src[srcOff, srcOff+bsize)` transposed
    * into `typesize` byte planes in `dst[0, bsize)`; the trailing
    * `bsize % typesize` bytes are copied through unshuffled. */
  private def shuffleBlock(typesize: Int, bsize: Int, src: Array[Byte],
      srcOff: Int, dst: Array[Byte]): Unit = {
    val nel = bsize / typesize
    var k = 0
    while (k < typesize) {
      var i = 0
      while (i < nel) {
        dst(k * nel + i) = src(srcOff + i * typesize + k)
        i += 1
      }
      k += 1
    }
    System.arraycopy(src, srcOff + nel * typesize, dst, nel * typesize,
      bsize - nel * typesize)
  }

  /** Inverse of [[shuffleBlock]], writing to `out[outOff, outOff+bsize)`. */
  private def unshuffle(typesize: Int, bsize: Int, src: Array[Byte],
      out: Array[Byte], outOff: Int): Unit = {
    val nel = bsize / typesize
    var k = 0
    while (k < typesize) {
      var i = 0
      while (i < nel) {
        out(outOff + i * typesize + k) = src(k * nel + i)
        i += 1
      }
      k += 1
    }
    System.arraycopy(src, nel * typesize, out, outOff + nel * typesize,
      bsize - nel * typesize)
  }
}
