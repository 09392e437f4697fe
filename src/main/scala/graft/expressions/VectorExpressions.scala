package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense float-vector kernels for the similarity-search operators.
  *
  * The pure-Column formulation (`aggregate(zip_with(a, b, _ * _), ...)`)
  * evaluates its lambda interpreted, per element, with boxing — measured
  * as the dominant cost of candidate scoring. These expressions run the
  * identical arithmetic (sequential left-to-right double accumulation
  * after an exact float→double widening per element, so results are
  * bit-for-bit the values the HOF chain produced and the DuckDB oracle
  * recomputes) as a tight primitive loop over the ArrayData.
  *
  * Inputs must be array<float> with no null elements (embedding columns).
  */
case class VecDot(children: Seq[Expression])
  extends Expression {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  // mismatched dimensionality is a data bug — surface it as NULL (the
  // zip_with formulation's behavior), never as a partial dot product
  override def eval(input: InternalRow): Any = {
    val va = children(0).eval(input)
    val vb = children(1).eval(input)
    if (va == null || vb == null) return null
    val a = va.asInstanceOf[ArrayData]
    val b = vb.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = children(0).genCode(ctx)
    val b = children(1).genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    ev.copy(code =
      code"""
        ${a.code}
        ${b.code}
        boolean ${ev.isNull} = ${a.isNull} || ${b.isNull} ||
          ${a.value}.numElements() != ${b.value}.numElements();
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          int $n = ${a.value}.numElements();
          for (int $i = 0; $i < $n; $i++) {
            ${ev.value} += (double) ${a.value}.getFloat($i) *
              (double) ${b.value}.getFloat($i);
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
  override def prettyName: String = "vec_dot"
}

/** Σ xᵢ² of a float array — sequential double accumulation (the caller
  * takes `sqrt` in Column space, mirroring the HOF formulation). */
case class VecSumSq(children: Seq[Expression])
  extends Expression {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    children.head.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${t.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val va = children(0).eval(input)
    if (va == null) return null
    val a = va.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = children(0).genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val x = ctx.freshName("x")
    ev.copy(code =
      code"""
        ${a.code}
        boolean ${ev.isNull} = ${a.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          int $n = ${a.value}.numElements();
          for (int $i = 0; $i < $n; $i++) {
            double $x = (double) ${a.value}.getFloat($i);
            ${ev.value} += $x * $x;
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
  override def prettyName: String = "vec_sumsq"
}

/** sign_lsh_bucket(vec, planes) — random-hyperplane sign bits packed
  * into an int. Hyperplane weight w(p,d) = ±1 from the low bit of
  * murmur3 over (p, d), exactly the value of Spark's
  * `hash(lit(p), d)` (default seed 42, ints folded left to right), so
  * buckets are bit-identical to the Column formulation
  * `when(hash(lit(p), d).bitwiseAND(1) === 1, 1.0, -1.0)` dotted
  * against the vector with sequential double accumulation. A non-default
  * `seed` yields an independent plane family (banded cosine LSH). */
case class SignLshBucket(children: Seq[Expression], planes: Int,
    seed: Int = 42)
  extends Expression with CodegenFallback {

  require(planes >= 1 && planes <= 30, s"planes=$planes")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    children.head.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${t.simpleString}")
    }

  import org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var bucket = 0
    var p = 0
    while (p < planes) {
      val seedP = hashInt(p, seed)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val w = if ((hashInt(d, seedP) & 1) == 1) 1.0 else -1.0
        acc += a.getFloat(d).toDouble * w
        d += 1
      }
      if (acc > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "sign_lsh_bucket"
}

/** centroid_cells(vec) — the `nprobe` IVF cells whose centroids have
  * highest cosine similarity to `vec`, best first (ties → larger cell
  * id), as one tight pass over the nlist×dim model.
  *
  * Centroids are L2-normalized once at construction, so the ranking
  * score is a plain dot product (the query's own norm is a common
  * positive factor — dividing by it cannot change the order). Exists
  * because the Column formulation built nlist independent cosine trees
  * per row — at nlist = 64 the generated projection fell out of
  * JIT-able method size and evaluation collapsed to interpreted tree
  * walks (measured: minutes instead of seconds on a 1M-row pass). */
case class CentroidCells(children: Seq[Expression],
    cents: Array[Array[Float]], nprobe: Int)
  extends Expression with CodegenFallback {

  require(cents.nonEmpty && nprobe >= 1, s"centroid_cells nlist=${cents.length} nprobe=$nprobe")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val unit: Array[Array[Double]] = cents.map { c =>
    var ss = 0.0
    var i = 0
    while (i < c.length) { ss += c(i).toDouble * c(i).toDouble; i += 1 }
    val s = math.sqrt(ss)
    val d = if (s == 0) 1.0 else s
    c.map(_.toDouble / d)
  }

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = a.getFloat(i).toDouble; i += 1 }
    val k = unit.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val u = unit(c)
      if (u.length != n) return null // dimensionality bug → NULL, like VecDot
      var s = 0.0
      var j = 0
      while (j < n) { s += x(j) * u(j); j += 1 }
      scores(c) = s
      c += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Any](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var bs = Double.NegativeInfinity
      var cc = 0
      while (cc < k) {
        if (!taken(cc) && (scores(cc) > bs ||
            (scores(cc) == bs && cc > best))) {
          best = cc; bs = scores(cc)
        }
        cc += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "centroid_cells"
}

/** pq_codes(vec) — product-quantization encode: the vector is split
  * into `books.length` equal subspaces; each subspace emits the index
  * of its nearest codebook entry by squared L2 distance (sequential
  * left-to-right double accumulation of squared diffs after exact
  * float→double widening — the order the DuckDB oracle replays with
  * `list_sum(list_transform(...))`; ties → smaller code). One tight
  * pass per row over the M×K×subdim model; output is M small ints —
  * the 1-byte-per-subspace compressed form a 100 TB vector store
  * persists in place of 4-byte floats. */
case class PqCodes(children: Seq[Expression],
    books: Array[Array[Array[Float]]])
  extends Expression with CodegenFallback {

  require(books.nonEmpty && books.forall(_.nonEmpty), "empty PQ codebook")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    children.head.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${t.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val m = books.length
    val sub = books(0)(0).length
    if (a.numElements() != m * sub) return null // dim bug → NULL, like VecDot
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val off = s * sub
      val book = books(s)
      var best = -1
      var bd = Double.PositiveInfinity
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val diff = a.getFloat(off + d).toDouble - c(d).toDouble
          acc += diff * diff
          d += 1
        }
        if (acc < bd) { bd = acc; best = j } // strict < keeps smaller j on ties
        j += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "pq_codes"
}

/** pq_dist_table(vec) — the query-side half of asymmetric-distance
  * (ADC) search: per subspace, the squared L2 distance from the
  * query's subvector to EVERY codebook entry (same arithmetic as
  * [[PqCodes]]), as array<array<double>>. Computed once per query row
  * and broadcast; corpus rows then score against codes alone via
  * [[PqAdc]] — the compressed-domain scan that never touches corpus
  * vectors. */
case class PqDistTable(children: Seq[Expression],
    books: Array[Array[Array[Float]]])
  extends Expression with CodegenFallback {

  require(books.nonEmpty && books.forall(_.nonEmpty), "empty PQ codebook")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    children.head.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${t.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val m = books.length
    val sub = books(0)(0).length
    if (a.numElements() != m * sub) return null
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val off = s * sub
      val book = books(s)
      val ds = new Array[Any](book.length)
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val diff = a.getFloat(off + d).toDouble - c(d).toDouble
          acc += diff * diff
          d += 1
        }
        ds(j) = acc
        j += 1
      }
      rows(s) = new org.apache.spark.sql.catalyst.util.GenericArrayData(ds)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "pq_dist_table"
}

/** pq_adc(dist_table, codes) — gather-and-sum: Σ over subspaces of
  * `dist_table(m)(codes(m))`, accumulated left-to-right (the order the
  * oracle's `list_sum(list(d ORDER BY m))` replays). The whole ADC
  * score is M array lookups and M adds per corpus row. */
case class PqAdc(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (children(0).dataType, children(1).dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<array<double>>, array<int>), got " +
            s"${a.simpleString}, ${b.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val vt = children(0).eval(input)
    val vc = children(1).eval(input)
    if (vt == null || vc == null) return null
    val dt = vt.asInstanceOf[ArrayData]
    val codes = vc.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (dt.numElements() != m) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      val row = dt.getArray(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= row.numElements()) return null
      acc += row.getDouble(c)
      s += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "pq_adc"
}

/** centroid_residual(vec, cell) — `vec − cents(cell)`, the residual a
  * vector keeps after IVF coarse quantization, in SINGLE-precision
  * arithmetic (Scala `Float` subtraction ≡ DuckDB `REAL - REAL`, so the
  * composed IVF-PQ oracle replays residuals bit for bit). The corpus
  * side computes it once at index build; the query side computes one
  * residual per probed cell — both pure map-side against the broadcast
  * nlist×dim model. NULL on null/mis-sized input or an out-of-range
  * cell (the loud-dim-bug convention of [[PqCodes]]). */
case class CentroidResidual(children: Seq[Expression],
    cents: Array[Array[Float]])
  extends Expression with CodegenFallback {

  require(cents.nonEmpty, "empty centroid model")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (children(0).dataType, children(1).dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, int), got " +
            s"${a.simpleString}, ${b.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    val cl = children(1).eval(input)
    if (v == null || cl == null) return null
    val cell = cl.asInstanceOf[Int]
    if (cell < 0 || cell >= cents.length) return null
    val c = cents(cell)
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != c.length) return null
    val out = new Array[Any](c.length)
    var i = 0
    while (i < c.length) {
      out(i) = a.getFloat(i) - c(i) // Float arithmetic, by design
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "centroid_residual"
}

/** seed_argmax(vec) — the seed id whose vector has the highest cosine
  * similarity to `vec`, replicating [[graft.operators.Ann]]'s
  * assignment contract BIT-FOR-BIT: per seed,
  * `VecDot(v,s) / (sqrt(VecSumSq(v)) * sqrt(VecSumSq(s)))` with the
  * same sequential double accumulation, compared with
  * `java.lang.Double.compare` (the [[TopKByScore]] total order) and
  * ties to the SMALLER seed id. Exists because the former formulation
  * — crossJoin against a broadcast seed frame, then a groupBy(id)
  * top-1 — shuffled corpus×seeds scored rows (64M at the 1M-vector /
  * 64-seed ScaleBench point) where a row-local argmax shuffles
  * nothing. NULL on a null vector or a seed-dimension mismatch, like
  * the cosine chain it replaces. */
case class SeedArgmax(children: Seq[Expression],
    seedIds: Array[Long], seeds: Array[Array[Float]])
  extends Expression with CodegenFallback {

  require(seeds.nonEmpty && seedIds.length == seeds.length, "seed model")
  // ties keep the first-seen seed, so ascending ids ARE the
  // smaller-id tie-break — enforce the precondition
  require(seedIds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "seedIds must be strictly ascending")

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    children.head.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${t.simpleString}")
    }

  // sqrt(VecSumSq(seed)) once per seed — the identical value the
  // Column chain computed per pair
  @transient private lazy val seedNorm: Array[Double] = seeds.map { s =>
    var ss = 0.0
    var i = 0
    while (i < s.length) { ss += s(i).toDouble * s(i).toDouble; i += 1 }
    math.sqrt(ss)
  }

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var ssv = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      ssv += x * x
      i += 1
    }
    val nv = math.sqrt(ssv)
    var best = -1
    var bs = 0.0
    var c = 0
    while (c < seeds.length) {
      val s = seeds(c)
      if (s.length == n) { // mismatch -> null score -> skipped, as before
        var dot = 0.0
        var j = 0
        while (j < n) { dot += a.getFloat(j).toDouble * s(j).toDouble; j += 1 }
        val score = dot / (nv * seedNorm(c))
        if (best < 0 || java.lang.Double.compare(score, bs) > 0) {
          best = c; bs = score
        } // equal -> keep earlier (smaller) seed id
      }
      c += 1
    }
    if (best < 0) null else seedIds(best)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(children = c)
  override def prettyName: String = "seed_argmax"
}
