package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** decode_bytes(payload) → array<int> of unsigned byte values.
  *
  * THE DECODE STUB of the multimodal pipeline: a real deployment would
  * invoke an image/audio codec here (JNI to turbojpeg/ffmpeg — not
  * available in this container, SURVEY north-star "multimodal columns").
  * The deterministic stand-in exposes the raw payload bytes so every
  * downstream stage — feature extraction, frame sampling, batch shapes —
  * is real, tested Spark plumbing. Swapping in a codec changes only this
  * expression's eval.
  */
case class BytesToIntArray(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) null
    else {
      val bytes = v.asInstanceOf[Array[Byte]]
      val out = new Array[Any](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
  override def prettyName: String = "decode_bytes"
}

/** resize_nearest(pixels, w, h, newW x newH) — nearest-neighbor resize
  * of a row-major w×h integer image, one eval per row.
  *
  * Exists because the Column formulation
  * (`transform(sequence(...), i => element_at(pad, ...))`) references
  * the padded-pixels column exactly once — inside the lambda — so
  * CollapseProject inlines the whole decode+pad subtree into the
  * lambda body, re-evaluating it once PER OUTPUT PIXEL (measured 64×
  * per row on the thumbnail query). Source indices are
  * floor(d·src/new) with `new` a power of two, exact in binary FP —
  * identical selection to the DuckDB oracle's integer division.
  */
case class ResizeNearest(children: Seq[Expression], newW: Int, newH: Int)
  extends Expression with CodegenFallback {

  require((newW & (newW - 1)) == 0 && (newH & (newH - 1)) == 0,
    s"resize dims must be powers of two: $newW x $newH")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val vp = children(0).eval(input)
    val vw = children(1).eval(input)
    val vh = children(2).eval(input)
    if (vp == null || vw == null || vh == null) return null
    val px = vp.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val w = vw.asInstanceOf[Number].longValue()
    val h = vh.asInstanceOf[Number].longValue()
    val out = new Array[Any](newW * newH)
    var i = 0
    while (i < newW * newH) {
      val dy = i / newW
      val dx = i % newW
      val sy = dy * h / newH
      val sx = dx * w / newW
      out(i) = px.getInt((sy * w + sx).toInt)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "resize_nearest"
}

/** stride_sample(pixels, k) — every k-th element (positions 0, k, 2k,
  * …), one eval per row. Same CollapseProject rationale as
  * [[ResizeNearest]]: the `transform(sequence(0, n-1, k),
  * i => element_at(pixels, i+1))` form re-evaluates a computed pixels
  * subtree per sampled element. */
case class StrideSample(children: Seq[Expression], stride: Int)
  extends Expression with CodegenFallback {

  require(stride >= 1, s"stride=$stride")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val px = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = px.numElements()
    val out = new Array[Any]((n + stride - 1) / stride)
    var i = 0
    var j = 0
    while (i < n) { out(j) = px.getInt(i); i += stride; j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "stride_sample"
}

/** png_encode(width, height, channels, pixels) → binary: a real PNG
  * (bit depth 8; gray/gray+alpha/RGB/RGBA by `channels`), written by
  * the from-scratch [[graft.io.Png]] codec with the given uniform
  * scanline filter. Row-local — payload construction happens inside
  * the scan stage, no driver involvement (the codec-exercise
  * counterpart of the WARC/HDF5 record writers). */
case class PngEncode(children: Seq[Expression], filterType: Int = 0)
  extends Expression with CodegenFallback {

  require(filterType >= 0 && filterType <= 4, s"filter $filterType")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = BinaryType

  override def eval(input: InternalRow): Any = {
    val vw = children(0).eval(input)
    val vh = children(1).eval(input)
    val vc = children(2).eval(input)
    val vp = children(3).eval(input)
    if (vw == null || vh == null || vc == null || vp == null) return null
    val w = vw.asInstanceOf[Number].intValue()
    val h = vh.asInstanceOf[Number].intValue()
    val c = vc.asInstanceOf[Number].intValue()
    val px = vp.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (px.numElements() != w * h * c) return null // dim bug → NULL
    val bytes = new Array[Byte](px.numElements())
    var i = 0
    while (i < bytes.length) { bytes(i) = px.getInt(i).toByte; i += 1 }
    graft.io.Png.encode(graft.io.Png.Image(w, h, c, bytes), filterType)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "png_encode"
}

/** png_decode(payload) → struct(width, height, channels, pixels
  * array<int>): the REAL image decode (replaces the
  * [[BytesToIntArray]] stub for PNG payloads) — full chunk/CRC
  * validation, all five scanline filters, palette expansion, via
  * [[graft.io.Png.decode]]. NULL on null input; a malformed payload
  * FAILS the task loudly (corrupt media at 100 TB should surface, not
  * silently decode to garbage — pre-filter with try_png_decode
  * semantics upstream if tolerance is wanted). */
case class PngDecode(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val img = graft.io.Png.decode(v.asInstanceOf[Array[Byte]])
    val px = new Array[Any](img.pixels.length)
    var i = 0
    while (i < px.length) { px(i) = img.pixels(i) & 0xff; i += 1 }
    InternalRow(img.width, img.height, img.channels,
      new GenericArrayData(px))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "png_decode"
}

/** try_png_decode(payload) — [[PngDecode]] that returns NULL on a
  * malformed payload instead of failing the task: the tolerant
  * ingest-filter form (count/quarantine corrupt media without killing
  * the job; the strict form stays the default so silent corruption
  * can't pass unnoticed once payloads are supposed to be clean). */
case class TryPngDecode(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = PngDecode(children).dataType

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    // NonFatal, not just IllegalArgumentException: hostile crawl bytes
    // can surface any parser exception, and the tolerant form's
    // contract is "classify, never kill the task" (VM errors like OOM
    // still propagate — NonFatal excludes them by design)
    val img =
      try graft.io.Png.decode(v.asInstanceOf[Array[Byte]])
      catch { case scala.util.control.NonFatal(_) => return null }
    val px = new Array[Any](img.pixels.length)
    var i = 0
    while (i < px.length) { px(i) = img.pixels(i) & 0xff; i += 1 }
    InternalRow(img.width, img.height, img.channels,
      new GenericArrayData(px))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "try_png_decode"
}

/** wav_encode(sample_rate, channels, samples) → binary: a real
  * RIFF/WAVE PCM-16 file written row-local by [[graft.io.Wav]]. */
case class WavEncode(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = BinaryType

  override def eval(input: InternalRow): Any = {
    val vr = children(0).eval(input)
    val vc = children(1).eval(input)
    val vs = children(2).eval(input)
    if (vr == null || vc == null || vs == null) return null
    val rate = vr.asInstanceOf[Number].intValue()
    val ch = vc.asInstanceOf[Number].intValue()
    val arr = vs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() % math.max(ch, 1) != 0) return null // shape bug
    val samples = new Array[Short](arr.numElements())
    var i = 0
    while (i < samples.length) { samples(i) = arr.getInt(i).toShort; i += 1 }
    graft.io.Wav.encode(graft.io.Wav.Audio(rate, ch, samples))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "wav_encode"
}

/** wav_decode(payload) → struct(sample_rate, channels, samples
  * array<int>): real RIFF/WAVE parse (PCM 8/16-bit, ancillary chunks
  * skipped, loud rejection of non-PCM) via [[graft.io.Wav.decode]].
  * Samples come back as signed 16-bit values. */
case class WavDecode(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val a = graft.io.Wav.decode(v.asInstanceOf[Array[Byte]])
    val out = new Array[Any](a.samples.length)
    var i = 0
    while (i < out.length) { out(i) = a.samples(i).toInt; i += 1 }
    InternalRow(a.sampleRate, a.channels, new GenericArrayData(out))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "wav_decode"
}

/** image_decode(payload) → struct(width, height, channels, pixels):
  * format dispatch by magic bytes — PNG signature → [[graft.io.Png]],
  * JPEG SOI → [[graft.io.Jpeg]] (baseline) — so one ingest projection
  * handles a mixed media column the way a crawl delivers it. Unknown
  * magic fails loudly (quarantine with [[TryImageDecode]] first when
  * tolerance is wanted). */
case class ImageDecode(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    ImageDecode.toRow(ImageDecode.decodeAny(v.asInstanceOf[Array[Byte]]))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "image_decode"
}

object ImageDecode {
  private[expressions] def decodeAny(bytes: Array[Byte]): graft.io.Png.Image = {
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8) graft.io.Jpeg.decode(bytes)
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      graft.io.Png.decode(bytes)
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F')
      graft.io.Gif.decode(bytes).head.image // first composited frame
    else throw new IllegalArgumentException(
      "unknown image magic (PNG, JPEG and GIF supported)")
  }

  private[expressions] def toRow(img: graft.io.Png.Image): InternalRow = {
    val px = new Array[Any](img.pixels.length)
    var i = 0
    while (i < px.length) { px(i) = img.pixels(i) & 0xff; i += 1 }
    InternalRow(img.width, img.height, img.channels, new GenericArrayData(px))
  }
}

/** try_image_decode(payload) — [[ImageDecode]] returning NULL on any
  * malformed/unsupported payload: the mixed-crawl quarantine filter. */
case class TryImageDecode(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ImageDecode(children).dataType

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    // NonFatal (see [[TryPngDecode]]): never let a hostile payload
    // kill the scan; VM errors still propagate
    val img =
      try ImageDecode.decodeAny(v.asInstanceOf[Array[Byte]])
      catch { case scala.util.control.NonFatal(_) => return null }
    ImageDecode.toRow(img)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "try_image_decode"
}

/** frame_spectra(samples) — framed discrete Fourier power spectra in
  * INTEGER-EXACT fixed-point arithmetic: the signal is cut into
  * `frame`-sample windows starting every `hop` samples (hop < frame
  * gives the standard overlapping STFT framing; hop = frame the
  * original non-overlapping form) and, per window, the power of the
  * first `bins` DFT bins is computed as re² + im² where
  * re = Σ s_i·twc(b,i), im = −Σ s_i·tws(b,i), with the twiddle
  * factors pre-rounded to ×2^15 integers ([[FrameSpectra.cosTable]]).
  * With `hann = true` the periodic Hann window 0.5·(1 − cos(2πi/N))
  * is applied with the SAME fixed-point discipline — pre-combined
  * into the twiddle table (round(hann·cos·32767),
  * [[FrameSpectra.hannCosTable]]) rather than multiplied per sample,
  * so the accumulator magnitude bound and the squaring overflow
  * analysis below are identical to the rectangular path (a separate
  * ×2^15 window multiply would scale products by 2^30 and wrap re²
  * at 8-bit amplitudes already). Because every operation is integer,
  * the DuckDB oracle replays the transform bit for bit by
  * interpolating the SAME tables as SQL literals — no float-trig
  * cross-engine drift. The fixed-point quantization is part of the
  * operator's contract (a spectral FEATURE for audio analysis —
  * silence detection, dominant tone, band energy — not a general
  * FFT). The accumulators are safe for any Int samples
  * (|re| ≤ frame·|s|·32767 < 2^58 even at frame=4096, |s|=2^31),
  * but the SQUARING can wrap: re² fits a Long only while
  * |s|·frame·32767 < 2^31.5 (≈1448 at frame=64, ≈22 at frame=4096
  * in the worst case — the b=0 bin with all samples at max reaches
  * it exactly). Rather than reject inputs on that conservative worst
  * case, the powers are computed with Math.multiplyExact/addExact:
  * genuine overflow throws loudly (and NULL-quarantines under any
  * try_* wrapper) instead of silently diverging from the oracle.
  * 8-bit-centered audio (|s| ≤ 128) never trips it at the supported
  * frame sizes ≤ 512; full-scale 16-bit input at large frames can,
  * by design.
  *
  * A partial tail frame is dropped (the [[graft.operators.Multimodal
  * .frameEnergies]] framing convention): frames number
  * (n − frame)/hop + 1 when n ≥ frame, else 0. Pure map-side; no
  * shuffle.
  */
case class FrameSpectra(children: Seq[Expression], frame: Int, bins: Int,
    hop: Int = 0, hann: Boolean = false)
  extends Expression with CodegenFallback {

  require(frame >= 2 && frame <= 4096, s"frame=$frame")
  require(bins >= 1 && bins <= frame / 2, s"bins=$bins for frame=$frame")
  require(hop >= 0 && hop <= frame, s"hop=$hop for frame=$frame")
  /** hop = 0 (default) means non-overlapping: hop = frame. */
  private val stride = if (hop == 0) frame else hop

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  @transient private lazy val twc =
    if (hann) FrameSpectra.hannCosTable(frame, bins)
    else FrameSpectra.cosTable(frame, bins)
  @transient private lazy val tws =
    if (hann) FrameSpectra.hannSinTable(frame, bins)
    else FrameSpectra.sinTable(frame, bins)

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    val nFrames = if (n < frame) 0 else (n - frame) / stride + 1
    val out = new Array[Any](nFrames)
    var f = 0
    while (f < nFrames) {
      val powers = new Array[Any](bins)
      var b = 0
      while (b < bins) {
        var re = 0L
        var im = 0L
        var i = 0
        while (i < frame) {
          val s = a.getInt(f * stride + i).toLong
          re += s * twc(b)(i)
          im -= s * tws(b)(i)
          i += 1
        }
        // checked: squaring is the only step that can wrap (see class doc)
        powers(b) = Math.addExact(
          Math.multiplyExact(re, re), Math.multiplyExact(im, im))
        b += 1
      }
      out(f) = new GenericArrayData(powers)
      f += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "frame_spectra"
}

object FrameSpectra {
  /** round(cos(2π·b·i/frame)·32767) — shared by the expression and the
    * SQL-oracle literal generator so both engines use identical
    * integer twiddles. */
  def cosTable(frame: Int, bins: Int): Array[Array[Long]] =
    Array.tabulate(bins, frame)((b, i) =>
      math.round(math.cos(2.0 * math.Pi * b * i / frame) * 32767.0))

  def sinTable(frame: Int, bins: Int): Array[Array[Long]] =
    Array.tabulate(bins, frame)((b, i) =>
      math.round(math.sin(2.0 * math.Pi * b * i / frame) * 32767.0))

  /** round(hann(i)·cos(2π·b·i/frame)·32767) with the periodic Hann
    * window hann(i) = 0.5·(1 − cos(2πi/frame)) — window and twiddle
    * pre-COMBINED before the single ×2^15 rounding so the windowed
    * transform keeps the rectangular path's exact overflow bounds
    * (class doc). Shared by the expression and the SQL-oracle literal
    * generator. */
  def hannCosTable(frame: Int, bins: Int): Array[Array[Long]] =
    Array.tabulate(bins, frame)((b, i) =>
      math.round(0.5 * (1.0 - math.cos(2.0 * math.Pi * i / frame)) *
        math.cos(2.0 * math.Pi * b * i / frame) * 32767.0))

  def hannSinTable(frame: Int, bins: Int): Array[Array[Long]] =
    Array.tabulate(bins, frame)((b, i) =>
      math.round(0.5 * (1.0 - math.cos(2.0 * math.Pi * i / frame)) *
        math.sin(2.0 * math.Pi * b * i / frame) * 32767.0))
}

/** gif_encode(width, height, frames) — an animated GIF89a over the
  * 256-entry grayscale palette (frame pixels are 0–255 indices; the
  * decoded RGB triple repeats the index), 4 cs per frame, written
  * row-local by [[graft.io.Gif]]. */
case class GifEncode(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = BinaryType

  @transient private lazy val grayPalette: Array[Byte] =
    Array.tabulate(256 * 3)(i => (i / 3).toByte)

  override def eval(input: InternalRow): Any = {
    val vw = children(0).eval(input)
    val vh = children(1).eval(input)
    val vf = children(2).eval(input)
    if (vw == null || vh == null || vf == null) return null
    val w = vw.asInstanceOf[Number].intValue()
    val h = vh.asInstanceOf[Number].intValue()
    val fr = vf.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val frames = (0 until fr.numElements()).map { i =>
      val px = fr.getArray(i)
      if (px.numElements() != w * h) return null // shape bug
      val b = new Array[Byte](px.numElements())
      var j = 0
      while (j < b.length) { b(j) = px.getInt(j).toByte; j += 1 }
      (b, 4)
    }
    if (frames.isEmpty) return null
    graft.io.Gif.encode(w, h, grayPalette, frames)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "gif_encode"
}

/** gif_frames(payload) → array<struct(width, height, channels, pixels)>
  * — the composited RGB animation frames of a real GIF
  * ([[graft.io.Gif.decode]]): the frame-sampling input for the video
  * modality. NULL on null input; malformed payloads fail loudly
  * (wrap with try-semantics upstream for quarantine). */
case class GifFrames(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val frames = graft.io.Gif.decode(v.asInstanceOf[Array[Byte]])
    new GenericArrayData(frames.map(f =>
      ImageDecode.toRow(f.image): Any).toArray)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "gif_frames"
}

/** gif_frame_wsums(frames, k) — per-frame position-weighted red-channel
  * sum Σ_p p·pixels[3p] over the first `k` frames of a
  * [[GifFrames]]-shaped array (interleaved RGB, IntegerType pixels).
  * Exists because the HOF form (`aggregate(zip_with(pixels,
  * sequence(...)))` per frame) allocates two 3·w·h transient arrays
  * per frame per row and evaluates an interpreted lambda per element —
  * on the GIF round-trip query that cost rivaled the codec itself.
  * Frames past the array's length yield 0 (the query asserts n_frames
  * separately). */
case class GifFrameWeightedSums(children: Seq[Expression], k: Int)
  extends Expression with CodegenFallback {

  require(k >= 1 && k <= 64, s"k=$k")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    children.head.dataType match {
      case ArrayType(s: StructType, _)
          if s.fieldNames.contains("pixels") &&
            s(s.fieldIndex("pixels")).dataType ==
              ArrayType(IntegerType, containsNull = false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gif_frame_wsums needs array<struct{..pixels: array<int>..}>, got $other")
    }
  }

  @transient private lazy val pixelsIdx: Int =
    children.head.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldIndex("pixels")
  @transient private lazy val frameFields: Int =
    children.head.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].size

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val frames = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val out = new Array[Long](k)
    var f = 0
    val nf = math.min(k, frames.numElements())
    while (f < nf) {
      // a null frame element (containsNull arrays pass the type check)
      // contributes 0, like a frame index past the array's end
      if (frames.isNullAt(f)) { f += 1 }
      else {
      // a null pixels value (nullable struct fields pass the type
      // check, which only compares the field's dataType) counts as 0,
      // like a null frame
      val px = frames.getStruct(f, frameFields).getArray(pixelsIdx)
      if (px != null) {
        val nElems = px.numElements()
        var s = 0L
        var p = 0
        // 3*p < nElems (not p < nElems/3): matches the HOF form this
        // replaced, which included index i=3p for ANY i < len — a
        // trailing partial RGB group still contributes its first byte
        while (3 * p < nElems) {
          s += p.toLong * px.getInt(3 * p)
          p += 1
        }
        out(f) = s
      }
      f += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "gif_frame_wsums"
}

/** shift_tile_frames(bytes, w, h) — `nFrames` cyclically-shifted
  * zero-padded tilings of a byte array: frame f pixel i =
  * bytes[(i+f) mod n] for i < n, else 0. One compiled pass; exists
  * because the HOF formulation references the decoded-bytes subtree
  * inside a lambda, and CollapseProject inlines it PER OUTPUT PIXEL
  * (the [[ResizeNearest]] pathology — measured 26× on the GIF
  * round-trip query). */
case class ShiftTileFrames(children: Seq[Expression], nFrames: Int)
  extends Expression with CodegenFallback {

  require(nFrames >= 1 && nFrames <= 64, s"nFrames=$nFrames")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType =
    ArrayType(ArrayType(IntegerType, containsNull = false),
      containsNull = false)

  override def eval(input: InternalRow): Any = {
    val vb = children(0).eval(input)
    val vw = children(1).eval(input)
    val vh = children(2).eval(input)
    if (vb == null || vw == null || vh == null) return null
    val bs = vb.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val w = vw.asInstanceOf[Number].intValue()
    val h = vh.asInstanceOf[Number].intValue()
    val n = bs.numElements()
    val size = w * h
    if (size < n) return null // tiling must cover the bytes
    val out = new Array[Any](nFrames)
    var f = 0
    while (f < nFrames) {
      val px = new Array[Any](size)
      var i = 0
      while (i < size) {
        px(i) = if (i < n) bs.getInt((i + f) % n) else 0
        i += 1
      }
      out(f) = new GenericArrayData(px)
      f += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(children = c)
  override def prettyName: String = "shift_tile_frames"
}
