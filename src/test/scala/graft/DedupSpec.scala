package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup operators: exactness of the crossJoin-free plans against naive
  * brute-force computation on synthetic near-dup corpora. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // synthetic corpus: templated docs with small mutations + unrelated noise
  private val docs: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the plain in spain"
    val tweaked = base.replace("lazy", "sleepy")
    val tweaked2 = base.replace("rain falls", "snow drifts")
    Seq(
      0L -> base, 1L -> base, 2L -> tweaked, 3L -> tweaked2,
      4L -> "completely different text about spark catalyst optimizer rules and physical plans",
      5L -> "yet another unrelated document mentioning voronoi tessellation of weather grids",
      6L -> (base + " extra trailing words appended here"),
      7L -> "short doc")
  }

  private def naiveJaccardPairs(n: Int, t: Double): Set[(Long, Long)] = {
    def sh(s: String): Set[String] = {
      val toks = s.trim.toLowerCase.split("\\s+")
      (0 until math.max(toks.length - n + 1, 1))
        .map(i => toks.slice(i, i + n).mkString(" ")).toSet
    }
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      j = sh(ta).intersect(sh(tb)).size.toDouble /
        math.max(sh(ta).union(sh(tb)).size, 1)
      if j >= t
    } yield (ia, ib)).toSet
  }

  test("jaccardPairsIndexed (prefix-filter) equals brute force") {
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.jaccardPairsIndexed(df, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == naiveJaccardPairs(3, 0.5))
    assert(got.nonEmpty) // the corpus does contain near-dups
  }

  test("jaccardPairsIndexed refine reads the shingle cache with zero sets-side exchanges or sorts") {
    // The r16 cache-partitioning restructure (VERDICT r15 #2, freeze
    // lifted): the sets cache is persisted pre-partitioned on id and
    // pre-sorted within partitions, and that layout must propagate
    // through the id_a/id_b alias projections into both refine joins —
    // each refine SMJ must have one side that is the bare cache scan
    // (no Exchange, no Sort above the InMemoryTableScan). AQE off for
    // a deterministic static tree; broadcast off so the refine takes
    // the shuffle-family path the 10M-doc corpus takes.
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = docs.toDF("doc_id", "text")
      val out = Dedup.jaccardPairsIndexed(df, "doc_id", "text", 3, 0.5)
      val plan = out.queryExecution.executedPlan
      val refineJoins = plan.collect {
        case j: SortMergeJoinExec if j.leftKeys.exists(k =>
            k.toString.contains("id_a") || k.toString.contains("id_b")) => j
      }
      assert(refineJoins.size == 2, s"expected 2 refine joins in:\n$plan")
      refineJoins.foreach { j =>
        val cleanSide = Seq(j.left, j.right).exists { side =>
          side.collect { case e: ShuffleExchangeExec => e }.isEmpty &&
          side.collect { case s: SortExec => s }.isEmpty &&
          side.collect { case c: InMemoryTableScanExec => c }.nonEmpty
        }
        assert(cleanSide,
          s"refine join has no exchange-free, sort-free cache side:\n$j")
      }
      // layout restructure must not perturb the result
      val got = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == naiveJaccardPairs(3, 0.5))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  test("jaccardPairsIndexed equals brute force on a collision-heavy random corpus") {
    // 120 docs over an 8-word vocabulary: every 3-shingle is frequent,
    // so the sampled rarity order actually has heavy tokens to rank
    // (the 8-doc corpus above exercises the empty-sample path) and the
    // prefix filter works under maximal token-collision pressure
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rnd = new scala.util.Random(4242)
    val bases: IndexedSeq[Vector[String]] = (0 until 120).map { _ =>
      val len = 8 + rnd.nextInt(10)
      Vector.fill(len)(vocab(rnd.nextInt(vocab.size)))
    }
    val big: Seq[(Long, String)] = (0L until 120L).map { i =>
      val words = bases(i.toInt)
      // every 8th doc: predecessor + two appended words (containment
      // 1.0 of the predecessor); every other 4th: predecessor with ONE
      // word swapped (high-Jaccard pair); the rest independent soup
      val doc =
        if (i % 8 == 7) bases(i.toInt - 1) ++ Vector("x", "y")
        else if (i % 4 == 3) {
          val p = bases(i.toInt - 1)
          p.updated(p.length / 2, vocab((vocab.indexOf(p(p.length / 2)) + 1)
            % vocab.size))
        } else words
      i -> doc.mkString(" ")
    }
    def sh(s: String, n: Int): Set[String] = {
      val toks = s.trim.toLowerCase.split("\\s+")
      (0 until math.max(toks.length - n + 1, 1))
        .map(i => toks.slice(i, i + n).mkString(" ")).toSet
    }
    val expect = (for {
      (ia, ta) <- big; (ib, tb) <- big if ia < ib
      j = sh(ta, 3).intersect(sh(tb, 3)).size.toDouble /
        math.max(sh(ta, 3).union(sh(tb, 3)).size, 1)
      if j >= 0.5
    } yield (ia, ib)).toSet
    val got = Dedup.jaccardPairsIndexed(big.toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expect)
    assert(expect.size > 10, s"corpus should be near-dup rich: ${expect.size}")
    val expectC = (for {
      (ia, ta) <- big; (ib, tb) <- big if ia != ib
      c = sh(ta, 3).intersect(sh(tb, 3)).size.toDouble /
        math.max(sh(ta, 3).size, 1)
      if c >= 0.8
    } yield (ia, ib)).toSet
    val gotC = Dedup.containmentPairsIndexed(big.toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(gotC == expectC)
    assert(expectC.size > 5, s"corpus should be containment-rich: ${expectC.size}")
  }

  test("jaccardSortedLong on hashed shingles equals jaccardSorted on strings") {
    // refineJaccard's shuffle-payload optimization: per-element xxhash64
    // + sort must preserve the exact Jaccard value (collisions aside,
    // ~1e-16 — none on any corpus we generate). Randomized over 200
    // collision-heavy doc pairs from a tiny vocabulary so intersections
    // are large and partial.
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rnd = new scala.util.Random(91)
    val pairs: Seq[(String, String)] = (0 until 200).map { _ =>
      def doc() = Vector.fill(6 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (doc(), doc())
    }
    val df = pairs.toDF("ta", "tb").select(
      Dedup.shingles(col("ta"), 3).as("sa"),
      Dedup.shingles(col("tb"), 3).as("sb"))
    def hashed(c: org.apache.spark.sql.Column) =
      sort_array(transform(c, xxhash64(_)))
    val rows = df.select(
        Dedup.jaccardSorted(col("sa"), col("sb")).as("js"),
        Dedup.jaccardSortedLong(hashed(col("sa")), hashed(col("sb"))).as("jl"))
      .as[(Double, Double)].collect()
    rows.foreach { case (js, jl) => assert(js == jl, s"$js != $jl") }
    assert(rows.exists { case (js, _) => js > 0 && js < 1 }) // non-degenerate
  }

  test("minhashNearDups (LSH candidates + refine) equals brute force") {
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.minhashNearDups(df, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == naiveJaccardPairs(3, 0.5))
  }

  test("BitmapIntersectUpperBound is a sound |A∩B| bound at every width") {
    // Soundness property the r16 prescreen rests on: for random hashed
    // sets and DELIBERATELY tiny bitmaps (64 bits → heavy within-set
    // collisions), the bound never undercuts the true intersection.
    import org.apache.spark.sql.graftbridge.Bridge
    val rnd = new scala.util.Random(20816)
    val rows = (0 until 300).map { _ =>
      val na = 1 + rnd.nextInt(60)
      val nb = 1 + rnd.nextInt(60)
      // overlapping value space so intersections are common
      val a = Seq.fill(na)(rnd.nextInt(120).toLong).distinct.sorted
      val b = Seq.fill(nb)(rnd.nextInt(120).toLong).distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    for (words <- Seq(1, 2, 4)) {
      def bm(c: org.apache.spark.sql.Column) = Bridge.column(
        graft.expressions.ShingleBitmap(Bridge.expression(c), words))
      val ub = (a: org.apache.spark.sql.Column, sa: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column, sb: org.apache.spark.sql.Column) =>
        Bridge.column(graft.expressions.BitmapIntersectUpperBound(Seq(
          Bridge.expression(a), Bridge.expression(sa),
          Bridge.expression(b), Bridge.expression(sb))))
      val got = rows.toDF("a", "b", "i")
        .select(col("i"), ub(bm(col("a")), size(col("a")),
          bm(col("b")), size(col("b"))).as("ub"))
        .as[(Int, Int)].collect()
      got.foreach { case (i, u) =>
        assert(u >= i, s"words=$words: bound $u undercuts true |A∩B|=$i")
      }
      // and at the default width over small sets the bound is TIGHT
      // often enough to be a useful screen, not just sound
      if (words == 4)
        assert(got.count { case (i, u) => u == i } > got.length / 2)
    }
  }

  test("minhashNearDups stays exact under maximal bitmap collision stress") {
    // 64-bit maps over ~16-shingle docs: within-set collisions abound,
    // so the screen's bound is loose — it must degrade toward keeping
    // pairs (exactness preserved), never toward dropping true pairs.
    val prev = sys.props.get("graft.bitmapWords")
    sys.props("graft.bitmapWords") = "1"
    try {
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.minhashNearDups(df, "doc_id", "text", 3, 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == naiveJaccardPairs(3, 0.5))
    } finally {
      prev match {
        case Some(v) => sys.props("graft.bitmapWords") = v
        case None => sys.props.remove("graft.bitmapWords")
      }
    }
  }

  test("minhashNearDups fuses the pair dedup into the refine clustering") {
    // r16 restructure probes: (1) no exchange partitions on BOTH pair
    // columns — the standalone distinct's hash(id_a, id_b) exchange is
    // gone, folded into the hash(id_a) repartition the refine needs
    // anyway; (2) every refine-family SMJ still has an exchange-free,
    // sort-free cache side (the r15 layout contract, now across the
    // bitmap-prescreen joins too).
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = docs.toDF("doc_id", "text")
      val out = Dedup.minhashNearDups(df, "doc_id", "text", 3, 0.5)
      val plan = out.queryExecution.executedPlan
      val pairKeyExchanges = plan.collect {
        case e: ShuffleExchangeExec if (e.outputPartitioning match {
          case h: HashPartitioning =>
            h.expressions.exists(_.toString.contains("id_a")) &&
              h.expressions.exists(_.toString.contains("id_b"))
          case _ => false
        }) => e
      }
      assert(pairKeyExchanges.isEmpty,
        s"standalone pair-distinct exchange survived:\n$plan")
      val refineJoins = plan.collect {
        case j: SortMergeJoinExec if j.leftKeys.exists(k =>
            k.toString.contains("id_a") || k.toString.contains("id_b")) => j
      }
      assert(refineJoins.size == 4,
        s"expected 2 prescreen + 2 refine joins in:\n$plan")
      refineJoins.foreach { j =>
        val cleanSide = Seq(j.left, j.right).exists { side =>
          side.collect { case e: ShuffleExchangeExec => e }.isEmpty &&
          side.collect { case s: SortExec => s }.isEmpty &&
          side.collect { case c: InMemoryTableScanExec => c }.nonEmpty
        }
        assert(cleanSide,
          s"join has no exchange-free, sort-free cache side:\n$j")
      }
      val got = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == naiveJaccardPairs(3, 0.5))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  test("MinHashSig matches the hash(s, lit(seed)) HOF formulation bit for bit") {
    import org.apache.spark.sql.functions._
    // includes a NULL-text row (ADVICE r8): the HOF yields a non-null
    // array of k nulls there, and the compiled form must match
    val df = (docs.map { case (i, t) => (i, Option(t)) } ++
        Seq(8L -> Some(""), 9L -> Some("one two three"), 10L -> None))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val hof = array((0 until 32).map { seed =>
      array_min(transform($"sh", s => hash(s, lit(seed))))
    }: _*)
    val rows = df.select($"doc_id",
        Dedup.minhashFromShingles($"sh", 32).as("fast"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) === r.getSeq[Any](2),
        s"signature mismatch for doc ${r.getLong(0)}")
    }
    assert(rows.length === docs.length + 3)
  }

  test("SortedXxHash64Array matches sort_array(transform(_, xxhash64)) bit for bit") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.Bridge
    // covers: plain arrays, empty array, NULL array, and a NULL
    // ELEMENT (xxhash64 of a null value returns the seed 42 — the
    // compiled form must reproduce that, not emit a null)
    val df = Seq(
      (1L, Seq("alpha beta", "beta gamma", "z")),
      (2L, Seq.empty[String]),
      (3L, null: Seq[String]),
      (4L, Seq("one", null, "two"))
    ).toDF("id", "sh")
    val fast = Bridge.column(graft.expressions.SortedXxHash64Array(
      Bridge.expression($"sh")))
    val rows = df.select($"id", fast.as("fast"),
        sort_array(transform($"sh", xxhash64(_))).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null mismatch id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"hash mismatch id ${r.getLong(0)}")
    }
    assert(rows.length === 4)
  }

  test("MinHashSigLong matches the hash(x, lit(seed)) HOF formulation bit for bit") {
    import org.apache.spark.sql.functions._
    // same contract as MinHashSig over pre-hashed long arrays: NULL and
    // empty inputs yield the non-null array of k nulls
    val df = (docs.map { case (i, t) => (i, Option(t)) } ++
        Seq(8L -> Some(""), 9L -> Some("one two three"), 10L -> None))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.hashedShingles($"text", 3).as("shh"))
    val hof = array((0 until 32).map { seed =>
      array_min(transform($"shh", x => hash(x, lit(seed))))
    }: _*)
    val rows = df.select($"doc_id",
        Dedup.minhashFromHashes($"shh", 32).as("fast"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) === r.getSeq[Any](2),
        s"signature mismatch for doc ${r.getLong(0)}")
    }
    assert(rows.length === docs.length + 3)
  }

  test("MinHashBandHashesLong matches the two-step sig + slice-hash banding bit for bit") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.Bridge
    val (k, bands) = (32, 16)
    val rowsPerBand = k / bands
    val df = (docs.map { case (i, t) => (i, Option(t)) } ++
        Seq(8L -> Some(""), 9L -> Some("one two three"), 10L -> None))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.hashedShingles($"text", 3).as("shh"))
    // the banding the fused expression replaced, stated as Columns:
    // sig from MinHashSigLong, band b = hash(slice(sig, b*rows+1, rows), 9999)
    val sig = Dedup.minhashFromHashes($"shh", k)
    val ref = array((0 until bands).map { b =>
      hash(slice(sig, b * rowsPerBand + 1, rowsPerBand), lit(9999))
    }: _*)
    val fused = Bridge.column(graft.expressions.MinHashBandHashesLong(
      Bridge.expression($"shh"), k, bands))
    val out = df.select($"doc_id", fused.as("fast"), ref.as("ref")).collect()
    out.foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](2),
        s"band-hash mismatch for doc ${r.getLong(0)}")
    }
    assert(out.length === docs.length + 3)
  }

  test("Md5MinHashSig matches the substring(md5(tok:block)) HOF formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.Bridge
    val df = (docs.map { case (i, t) => (i, Option(t)) } ++
        Seq(8L -> Some(""), 9L -> Some("one two three"), 10L -> None))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    // the oracle's definition, stated as a Column program: component
    // f = min over tokens of substring(md5(tok:f/4), (f%4)*8+1, 8)
    val hof = array((0 until 32).map { f =>
      array_min(transform($"sh", t =>
        md5(concat(t, lit(":" + (f / 4)))).substr(lit(f % 4 * 8 + 1), lit(8))))
    }: _*)
    val rows = df.select($"doc_id",
        Bridge.column(graft.expressions.Md5MinHashSig(
          Bridge.expression($"sh"), 32)).as("fast"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) === r.getSeq[Any](2),
        s"signature mismatch for doc ${r.getLong(0)}")
    }
    assert(rows.length === docs.length + 3)
  }

  test("SimHashFp matches the explode + per-bit aggregate plan bit for bit") {
    import org.apache.spark.sql.functions._
    val bits = 48
    val df = (docs ++ Seq(8L -> "", 9L -> "  ", 10L -> "Mixed CASE tokens"))
      .toDF("doc_id", "text")
    // the former formulation, kept inline as the reference
    val toks = df.select(col("doc_id").cast("long").as("id"),
      explode_outer(array_distinct(split(trim(lower(col("text"))), "\\s+"))).as("t"))
    val h = conv(substring(md5(col("t")), 1, bits / 4), 16, 10).cast("long")
    val ref = toks.select(col("id"), h.as("h"))
      .groupBy("id")
      .agg(sum(shiftright(col("h"), 0).bitwiseAND(1L) * 2L - 1L).as("v0"),
        (1 until bits).map(i =>
          sum(shiftright(col("h"), i).bitwiseAND(1L) * 2L - 1L).as(s"v$i")): _*)
      .select(col("id"),
        (0 until bits).map(i =>
          when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
          .reduce(_ + _).as("fp"))
      .as[(Long, Long)].collect().toMap
    val got = Dedup.simhashFingerprints(df, "doc_id", "text", bits)
      .as[(Long, Long)].collect().toMap
    assert(got === ref)
    assert(got.size === docs.size + 3)
  }

  test("hammingBands: maxDist+1 bands tiling all bits") {
    val bands = Dedup.hammingBands(48, 6)
    assert(bands.length == 7)
    assert(bands.map(_._2).sum == 48)
    assert(bands.head._1 == 0)
    assert(bands.sliding(2).forall { case Seq((o1, w1), (o2, _)) => o2 == o1 + w1 })
  }

  test("simhashNearDups equals brute-force hamming pairs (pigeonhole recall)") {
    val df = docs.toDF("doc_id", "text")
    val banded = Dedup.simhashNearDups(df, "doc_id", "text", maxDist = 6, bits = 48)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    // brute force over fingerprints computed by the same expression
    val fps = df.select($"doc_id",
      Dedup.simhash($"text", 48).as("fp")).as[(Long, Long)].collect().toMap
    val brute = (for {
      (ia, _) <- docs; (ib, _) <- docs if ia < ib
      h = java.lang.Long.bitCount(fps(ia) ^ fps(ib))
      if h <= 6
    } yield (ia, ib, h)).toSet
    assert(banded == brute)
    assert(banded.exists(_._3 == 0)) // identical docs collapse to distance 0
  }

  test("connectedComponents converges on a 1000-vertex path graph") {
    // worst case for plain min-label propagation (diameter 999): the
    // auto-enabled pointer jumping must close it in O(log n) rounds
    // within the default maxIters=50, and the per-round unpersist +
    // periodic localCheckpoint must keep lineage bounded throughout
    val ids = spark.range(1000).select($"id")
    val pairs = spark.range(999)
      .select($"id".as("id_a"), ($"id" + 1).as("id_b"))
    // driverFinishEdges = 0 forces the ITERATIVE regime — this test
    // exists to cover pointer jumping + the delta finish, which the
    // small-graph driver union-find would otherwise short-circuit
    val labels = Dedup.connectedComponents(ids, pairs, driverFinishEdges = 0)
      .as[(Long, Long)].collect()
    assert(labels.length == 1000)
    assert(labels.forall(_._2 == 0L)) // one component, min id 0
    // and the driver union-find regime must agree exactly
    val viaDriver = Dedup.connectedComponents(ids, pairs)
      .as[(Long, Long)].collect()
    assert(viaDriver.sortBy(_._1).sameElements(labels.sortBy(_._1)))
  }

  test("connectedComponents labels multiple components + isolated ids") {
    val ids = spark.range(10).select($"id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 7L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(ids, pairs)
      .as[(Long, Long)].collect().toMap
    val want = Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 9L)
    assert(got == want)
  }

  test("connectedComponents delta-phase bail resumes DataFrame rounds with identical labels") {
    // small graphs enter the driver-delta finish immediately (frontier
    // < 10k); a 2-row probe cap forces the bail branch on the first
    // delta round (a 100-vertex path's frontier neighbors exceed it),
    // so the merge-back + resumed DataFrame rounds are what converge.
    // Labels must equal the uncapped run's exactly — the fixpoint is
    // schedule-independent and the bail must not lose the delta.
    val ids = spark.range(100).select($"id")
    val pairs = spark.range(99)
      .select($"id".as("id_a"), ($"id" + 1).as("id_b"))
    val capped = Dedup.connectedComponents(ids, pairs,
        deltaCapRows = 2, driverFinishEdges = 0)
      .as[(Long, Long)].collect().toMap
    val free = Dedup.connectedComponents(ids, pairs)
      .as[(Long, Long)].collect().toMap
    assert(capped == free)
    assert(capped.values.forall(_ == 0L))
  }

  test("exact dedup groups identical docs under one digest") {
    val df = docs.toDF("doc_id", "text")
    val r = Dedup.exact(df, "doc_id", "text")
      .filter($"n_copies" > 1).select("doc_id", "n_copies")
      .as[(Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 2L))) // docs 0 and 1 identical, min id kept
  }

  test("containment flags a doc quoted wholesale inside a larger one") {
    // doc 6 = doc 0 + trailing words: every shingle of doc 0 appears in
    // doc 6 (containment 1.0) but NOT vice versa; the symmetric-Jaccard
    // view of the same pair is < 1. Identical docs 0/1 contain each
    // other both ways.
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.containmentPairsIndexed(df, "doc_id", "text", 3, 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 6L)) && got.contains((1L, 6L)))
    assert(!got.contains((6L, 0L)) && !got.contains((6L, 1L)))
    assert(got.contains((0L, 1L)) && got.contains((1L, 0L)))
  }

  test("eager shingle-cache gate follows the bypass-merge threshold; knob overrides") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // at/below the bypass threshold (default 200) the sort-based
      // shuffle writer never engages, so the fd failure mode the
      // eager split prevents can't exist → lazy
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      assert(!Dedup.eagerShingleCacheDefault(spark))
      spark.conf.set("spark.sql.shuffle.partitions", "201")
      assert(Dedup.eagerShingleCacheDefault(spark))
      // explicit knob wins over the gate, both directions
      sys.props("graft.eagerShingleCache") = "false"
      assert(!Dedup.eagerShingleCacheDefault(spark))
      sys.props("graft.eagerShingleCache") = "true"
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      assert(Dedup.eagerShingleCacheDefault(spark))
    } finally {
      sys.props.remove("graft.eagerShingleCache")
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
