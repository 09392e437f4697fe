package graft

/** The SQL face of the expression layer: after registration every st_*
  * function runs from spark.sql like a builtin. */
class SqlFunctionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("geometry SQL end-to-end: construct, measure, predicate, transform") {
    val r = spark.sql(
      """SELECT
        |  st_area(st_makebox(0D, 0D, 4D, 3D)) AS a,
        |  st_astext(st_centroid(st_makebox(0D, 0D, 4D, 3D))) AS c,
        |  st_within(st_point(1D, 1D), st_makebox(0D, 0D, 2D, 2D)) AS w,
        |  st_area(st_intersection(st_makebox(0D, 0D, 2D, 2D),
        |                          st_makebox(1D, 1D, 3D, 3D))) AS ia,
        |  st_npoints(st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 0))')) AS np
        |""".stripMargin).head()
    assert(r.getDouble(0) == 12.0)
    assert(r.getString(1) == "POINT (2 1.5)")
    assert(r.getBoolean(2))
    assert(r.getDouble(3) == 1.0)
    assert(r.getInt(4) == 4)
  }

  test("st_transform from SQL matches the Scala API") {
    val sqlEn = spark.sql(
      """SELECT st_x(st_transform(st_point(-0.1D, 51.5D), 4326, 27700)) AS e,
        |       st_y(st_transform(st_point(-0.1D, 51.5D), 4326, 27700)) AS n
        |""".stripMargin).head()
    val (e, n) = graft.geom.Osgb.wgs84ToOsgb(51.5, -0.1)
    assert(sqlEn.getDouble(0) == e && sqlEn.getDouble(1) == n)
  }

  test("vector and text kernels from SQL match the Column API") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(cast(1.5 as float), cast(-2 as float)),
        |          array(cast(4 as float), cast(0.5 as float))) AS d,
        |  vec_sumsq(array(cast(3 as float), cast(4 as float))) AS s,
        |  word_shingles('The quick  brown fox', 2) AS sh,
        |  sign_lsh_bucket(array(cast(1 as float), cast(-1 as float),
        |                        cast(0.5 as float), cast(2 as float)), 8) AS b
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.5 * 4.0 + -2.0 * 0.5)
    assert(r.getDouble(1) == 25.0)
    assert(r.getSeq[String](2) ==
      Seq("brown fox", "quick brown", "the quick"))
    val apiBucket = Seq(Tuple1(Array(1f, -1f, 0.5f, 2f))).toDF("v")
      .select(graft.operators.Ann.lshBucket(org.apache.spark.sql.functions.col("v"), 8))
      .head().getInt(0)
    assert(r.getInt(3) == apiBucket)
  }

  test("repetition_stats from SQL matches the compiled expression") {
    val r = spark.sql(
      "SELECT repetition_stats('buy now buy now buy now', 2) AS s").head()
    val s = r.getStruct(0)
    assert(s.getInt(0) == 6)  // n_toks
    assert(s.getInt(1) == 2)  // n_distinct
    assert(s.getInt(2) == 3)  // 'buy now' x3
  }

  test("layout and fingerprint kernels from SQL match the Column/eval API") {
    val r = spark.sql(
      """SELECT
        |  zorder_value(5L, 3L, 16) AS z,
        |  winnow_fingerprints('abcdefghijklmnop', 4, 4) AS fps
        |""".stripMargin).head()
    // interleave of 5 (101) and 3 (011): bits 0,2 from 5 -> 1+4? -> even
    // positions 0,4; bits 0,1 of 3 -> odd positions 1,3 => 1+2+8+16 = 27
    assert(r.getLong(0) == 27L)
    val api = spark.sql("SELECT 1").sparkSession.range(1)
      .select(org.apache.spark.sql.graftbridge.Bridge.column(
        graft.expressions.WinnowFingerprints(Seq(
          org.apache.spark.sql.graftbridge.Bridge.expression(
            org.apache.spark.sql.functions.lit("abcdefghijklmnop"))), 4, 4)))
      .head().getSeq[Long](0)
    assert(r.getSeq[Long](1) == api)
  }

  test("media codecs are callable from SQL: PNG and WAV round-trip") {
    val r = spark.sql(
      """SELECT
        |  png_decode(png_encode(2, 2, 1, array(10, 20, 30, 40))) AS img,
        |  wav_decode(wav_encode(8000, 1, array(-5, 0, 7))) AS au,
        |  try_png_decode(cast('junk' as binary)) AS bad,
        |  try_image_decode(png_encode(1, 1, 3, array(1, 2, 3))) AS auto
        |""".stripMargin).head()
    val img = r.getStruct(0)
    assert(img.getInt(0) == 2 && img.getInt(1) == 2 && img.getInt(2) == 1)
    assert(img.getSeq[Int](3) == Seq(10, 20, 30, 40))
    val au = r.getStruct(1)
    assert(au.getInt(0) == 8000 && au.getInt(1) == 1)
    assert(au.getSeq[Int](2) == Seq(-5, 0, 7))
    assert(r.isNullAt(2), "try_png_decode of junk must be NULL")
    assert(r.getStruct(3).getSeq[Int](3) == Seq(1, 2, 3))
  }

  test("signature/DSP kernels from SQL match the Column API") {
    val r = spark.sql(
      """SELECT
        |  minhash_sig(array('a', 'b', 'c'), 4) AS mh,
        |  simhash_fp('hello world hello', 16) AS sh,
        |  stride_sample(array(1, 2, 3, 4, 5, 6, 7), 3) AS st,
        |  frame_spectra(array(1, 0, -1, 0), 4, 2) AS sp
        |""".stripMargin).head()
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.functions._
    val api = spark.range(1).select(
        Bridge.column(graft.expressions.MinHashSig(
          Bridge.expression(array(lit("a"), lit("b"), lit("c"))), 4)),
        Bridge.column(graft.expressions.SimHashFp(
          Bridge.expression(lit("hello world hello")), 16)))
      .head()
    assert(r.getSeq[Int](0) == api.getSeq[Int](0))
    assert(r.getLong(1) == api.getLong(1))
    assert(r.getSeq[Int](2) == Seq(1, 4, 7))
    // frame [1,0,-1,0] is a pure bin-1 cosine: bin 0 sums to 0; bin 1
    // re = 32767 + 32767 = 65534 -> P = 65534²
    val sp = r.getSeq[scala.collection.Seq[Long]](3)
    assert(sp.length == 1 && sp.head.length == 2)
    assert(sp.head(0) == 0L && sp.head(1) > 0L)
  }

  test("frame_spectra overlapping Hann framing matches a direct reference") {
    // 160 samples, frame 64, hop 32 -> (160-64)/32+1 = 4 overlapping
    // frames; expected powers recomputed here with an independent
    // plain-Scala loop over the SAME combined Hann×twiddle tables
    val n = 160
    val sig = Array.tabulate(n)(i =>
      (100.0 * math.sin(2 * math.Pi * 3 * i / 64.0)).toInt)
    val tc = graft.expressions.FrameSpectra.hannCosTable(64, 8)
    val ts = graft.expressions.FrameSpectra.hannSinTable(64, 8)
    val expected = (0 until 4).map { f =>
      (0 until 8).map { b =>
        var re = 0L; var im = 0L
        for (i <- 0 until 64) {
          re += sig(f * 32 + i) * tc(b)(i)
          im -= sig(f * 32 + i) * ts(b)(i)
        }
        re * re + im * im
      }
    }
    val got = spark.sql(
      s"SELECT frame_spectra(array(${sig.mkString(",")}), 64, 8, 32, true)")
      .head().getSeq[scala.collection.Seq[Long]](0)
    assert(got.length == 4)
    for (f <- 0 until 4)
      assert(got(f) == expected(f), s"frame $f")
    // a bin-3 sine must be dominated by bin 3 in every frame
    for (f <- 0 until 4)
      assert(got(f).indexOf(got(f).max) == 3, s"frame $f dominant bin")
    // rect-window overlap: hop 2 on 6 samples of frame 4 -> 2 frames
    val rect = spark.sql(
      "SELECT frame_spectra(array(1, 0, -1, 0, 1, 0), 4, 2, 2)")
      .head().getSeq[scala.collection.Seq[Long]](0)
    assert(rect.length == 2)
  }

  test("frame_spectra power overflow throws loudly instead of wrapping") {
    // full-scale 16-bit samples at frame=4096: |re| reaches
    // 4096·32767·32767 ≈ 2^42, whose square is far past Long — the
    // checked math must surface ArithmeticException, never a silently
    // wrapped power that diverges from the oracle.
    val e = intercept[Exception](spark.sql(
      "SELECT frame_spectra(array_repeat(32767, 4096), 4096, 1)").head())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in: ${chain(e).map(_.getClass.getName)}")
  }

  test("a reference-shaped SQL query over a registered view") {
    import spark.implicits._
    Seq((0L, 3.0, 1.0), (1L, 7.0, 1.0), (2L, 12.0, 1.0))
      .toDF("cell", "lon", "lat").createOrReplaceTempView("grid_cells")
    val kept = spark.sql(
      """SELECT cell FROM grid_cells
        |WHERE st_within(st_makebox(lon - 2.5, lat - 1, lon + 2.5, lat + 1),
        |                st_makebox(0D, 0D, 10D, 2D))
        |ORDER BY cell""".stripMargin)
      .as[Long].collect().toSeq
    assert(kept == Seq(0L, 1L))
  }
}
