package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.expressions._

/** SQL-surface registration of the engine's expressions: after
  * registration, every `st_*` geometry function (and the dedup helpers)
  * is callable from `spark.sql(...)` exactly like a builtin — the SQL
  * face of the same Catalyst expressions the Column API wraps.
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.GraftExtensions`
  *    (cluster deployments; applied at session build time)
  *  - [[GraftFunctions.register]] for an already-running session
  *    (notebooks, tests)
  */
object GraftFunctions {

  /** (name, builder) for every SQL-exposed expression. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "st_point" -> (STPoint(_)),
    "st_makebox" -> (STMakeBox(_)),
    "st_polygon" -> (STPolygon(_)),
    "st_within" -> (STWithin(_)),
    "st_contains" -> (STContains(_)),
    "st_intersects" -> (STIntersects(_)),
    "st_intersection" -> (STIntersection(_)),
    "st_area" -> (STArea(_)),
    "st_distance" -> (STDistance(_)),
    "st_centroid" -> (STCentroid(_)),
    "st_x" -> (STX(_)),
    "st_y" -> (STY(_)),
    "st_xmin" -> (STXMin(_)),
    "st_ymin" -> (STYMin(_)),
    "st_xmax" -> (STXMax(_)),
    "st_ymax" -> (STYMax(_)),
    "st_npoints" -> (STNPoints(_)),
    "st_geometrytype" -> (STGeometryType(_)),
    "st_astext" -> (STAsText(_)),
    "st_geomfromtext" -> (STGeomFromText(_)),
    "st_transform" -> (STTransform(_)),
    "st_buffer" -> (STBuffer(_)),
    "st_simplify" -> (STSimplify(_)),
    "st_convexhull" -> (STConvexHull(_)),
    "st_envelope" -> (STEnvelope(_)),
    "st_length" -> (STLength(_)),
    "st_boundary" -> (STBoundary(_)),
    "st_union" -> (STUnion(_)),
    "sorted_intersect_count" -> (SortedIntersectCount(_)),
    "vec_dot" -> (VecDot(_)),
    "vec_sumsq" -> (VecSumSq(_)),
    "word_shingles" -> (cs => WordShingles(Seq(cs.head), intArg(cs, 1, "word_shingles"))),
    "word_ngrams" -> (cs => WordNgrams(Seq(cs.head), intArg(cs, 1, "word_ngrams"))),
    "sign_lsh_bucket" -> (cs => SignLshBucket(Seq(cs.head), intArg(cs, 1, "sign_lsh_bucket"))),
    "winnow_fingerprints" -> (cs => WinnowFingerprints(Seq(cs.head),
      intArg(cs, 1, "winnow_fingerprints"), intArg(cs, 2, "winnow_fingerprints"))),
    "zorder_value" -> (cs => ZOrderValue(cs.init, intArg(cs, cs.length - 1, "zorder_value"))),
    "repetition_stats" -> (cs => RepetitionStats(Seq(cs.head),
      intArg(cs, 1, "repetition_stats"))),
    "decode_bytes" -> (BytesToIntArray(_)),
    // real media codecs (PNG / baseline+progressive JPEG / WAV)
    "png_encode" -> (PngEncode(_)),
    "png_decode" -> (PngDecode(_)),
    "try_png_decode" -> (TryPngDecode(_)),
    "image_decode" -> (ImageDecode(_)),
    "try_image_decode" -> (TryImageDecode(_)),
    "wav_encode" -> (WavEncode(_)),
    "wav_decode" -> (WavDecode(_)),
    "gif_encode" -> (GifEncode(_)),
    "gif_frames" -> (GifFrames(_)),
    // signature / sampling / DSP kernels with constant parameters
    "minhash_sig" -> (cs => MinHashSig(cs.head, intArg(cs, 1, "minhash_sig"))),
    "simhash_fp" -> (cs => SimHashFp(cs.head, intArg(cs, 1, "simhash_fp"))),
    "stride_sample" -> (cs => StrideSample(Seq(cs.head),
      intArg(cs, 1, "stride_sample"))),
    "resize_nearest" -> (cs => ResizeNearest(cs.take(3),
      intArg(cs, 3, "resize_nearest"), intArg(cs, 4, "resize_nearest"))),
    // frame_spectra(samples, frame, bins[, hop[, hann]]): hop 0/absent
    // = non-overlapping; hann true applies the integer-exact window
    "frame_spectra" -> (cs => FrameSpectra(Seq(cs.head),
      intArg(cs, 1, "frame_spectra"), intArg(cs, 2, "frame_spectra"),
      if (cs.length > 3) intArg(cs, 3, "frame_spectra") else 0,
      cs.length > 4 && boolArg(cs, 4, "frame_spectra"))))

  /** Constant boolean argument of a SQL call. */
  private def boolArg(cs: Seq[Expression], i: Int, fn: String): Boolean = {
    require(cs(i).foldable, s"$fn: argument ${i + 1} must be a constant")
    cs(i).eval(null) match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a boolean, got $other")
    }
  }

  /** Constant integer argument of a SQL call (e.g. the shingle width). */
  private def intArg(cs: Seq[Expression], i: Int, fn: String): Int = {
    require(cs.length > i, s"$fn: missing argument ${i + 1}")
    require(cs(i).foldable, s"$fn: argument ${i + 1} must be a constant")
    cs(i).eval(null) match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer, got $other")
    }
  }

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.expressions", name)

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), children => builder(children))
    }
}

/** `spark.sql.extensions` hook: FunctionRegistry registration (SURVEY
  * §2.8) + the spatial-join optimizer rule (SURVEY §4). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.expressions", name),
        children => builder(children)))
    }
    ext.injectOptimizerRule(_ => graft.plans.SpatialJoinRewrite)
  }
}
