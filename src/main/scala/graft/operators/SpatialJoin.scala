package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geom.st

/** Distributed spatial join via grid-bucket explode + exact refine
  * (SURVEY §2.3 J3/J4, §4 "spatial-index join").
  *
  * The reference leans on GeoPandas' in-RAM R-tree (`sjoin`
  * delphine/regrid.py:167-177, `overlay` :267-270) — single-process,
  * whole-dataset-in-memory. The scale-out re-expression: assign every
  * geometry the grid buckets its envelope covers (a generator over pure
  * column arithmetic — codegen'd, no shuffle), equi-join on the bucket id
  * (stock shuffle-hash/sort-merge join on an 16-byte key — Catalyst
  * plans, AQE handles skew), then refine with the exact JTS predicate.
  *
  * Duplicate-pair elimination uses REFERENCE-POINT dedup: a candidate
  * pair may share several buckets, but is emitted only from the bucket
  * containing the top-left corner of the envelope intersection — pure
  * arithmetic, no `distinct()` shuffle afterwards.
  *
  * 100 TB notes: shuffle volume is O(geoms × buckets-per-geom); pick
  * `cellSize` near the median geometry extent so buckets-per-geom stays
  * O(1). Skewed buckets (dense regions) are split by AQE skew-join
  * handling since the join is a plain equi-join.
  */
object SpatialJoin {

  /** Packed ids of all buckets a geometry's envelope covers. */
  def bucketIds(geom: Column, cellSize: Double): Column = {
    val bx0 = floor(st.xmin(geom) / cellSize).cast("long")
    val bx1 = floor(st.xmax(geom) / cellSize).cast("long")
    val by0 = floor(st.ymin(geom) / cellSize).cast("long")
    val by1 = floor(st.ymax(geom) / cellSize).cast("long")
    flatten(transform(sequence(bx0, bx1), bx =>
      transform(sequence(by0, by1), by =>
        struct(bx.as("bx"), by.as("by")))))
  }

  /** The single bucket holding the reference point (min corner of the
    * envelope intersection) of a candidate pair. */
  private def refBucket(a: Column, b: Column, cellSize: Double): Column =
    struct(
      floor(greatest(st.xmin(a), st.xmin(b)) / cellSize).cast("long").as("bx"),
      floor(greatest(st.ymin(a), st.ymin(b)) / cellSize).cast("long").as("by"))

  /** Spatial join of `left` and `right` on `predicate(leftGeom,
    * rightGeom)`. Column names of the two sides must be disjoint.
    * Emits each qualifying pair exactly once.
    *
    * The generic-predicate form: bucket explode and reference-point
    * dedup run as the fused one-parse-per-row expressions
    * ([[graft.expressions.STEnvelopeCells]]), but the caller's
    * predicate stays a separate Column, so its geometry arguments
    * re-parse. [[joinContains]]/[[overlayIntersection]] — the two
    * named predicates every declared query uses — go through
    * [[joinFused]] instead, which folds the predicate into the same
    * single parse (r16 opt; 6 WKB parses per candidate → 2). */
  def join(left: DataFrame, right: DataFrame,
      leftGeom: String, rightGeom: String, cellSize: Double,
      predicate: (Column, Column) => Column): DataFrame = {
    val l = left.withColumn("__bucket",
      explode(st.envelopeCells(col(leftGeom), cellSize)))
    val r = right.withColumn("__bucket",
      explode(st.envelopeCells(col(rightGeom), cellSize)))
    l.join(r, "__bucket")
      .filter(col("__bucket") === refBucket(col(leftGeom), col(rightGeom), cellSize) &&
        predicate(col(leftGeom), col(rightGeom)))
      .drop("__bucket")
  }

  /** [[join]] with the refine fully fused ([[graft.expressions.STPairRefine]]):
    * reference-point dedup + the named JTS predicate in ONE expression,
    * one WKB parse per side per candidate. */
  private def joinFused(left: DataFrame, right: DataFrame,
      leftGeom: String, rightGeom: String, cellSize: Double,
      intersects: Boolean): DataFrame = {
    val l = left.withColumn("__bucket",
      explode(st.envelopeCells(col(leftGeom), cellSize)))
    val r = right.withColumn("__bucket",
      explode(st.envelopeCells(col(rightGeom), cellSize)))
    l.join(r, "__bucket")
      .filter(st.pairRefine(col(leftGeom), col(rightGeom),
        col("__bucket.bx"), col("__bucket.by"), cellSize, intersects))
      .drop("__bucket")
  }

  /** J3: point-in-polygon join (the reference's `sjoin`). */
  def joinContains(polys: DataFrame, points: DataFrame,
      polyGeom: String, pointGeom: String, cellSize: Double): DataFrame =
    joinFused(polys, points, polyGeom, pointGeom, cellSize,
      intersects = false)

  /** J4: overlay intersection (the reference's `gpd.overlay(...,
    * "intersection")`) — qualifying pairs carry both attribute sets plus
    * the intersection piece and its area. */
  def overlayIntersection(left: DataFrame, right: DataFrame,
      leftGeom: String, rightGeom: String, cellSize: Double): DataFrame =
    joinFused(left, right, leftGeom, rightGeom, cellSize,
      intersects = true)
      .withColumn("__piece", st.intersection(col(leftGeom), col(rightGeom)))
      .withColumn("piece_area", st.area(col("__piece")))
      .withColumnRenamed("__piece", "piece_geom")

  /** Distance join (`ST_DWithin`): every (a, b) point pair within
    * Euclidean distance `d`, as `(id_a, id_b, dist)`. The left side
    * explodes to the grid cells its d-radius disc's bounding box
    * covers; the right side sits in its OWN single cell — so the
    * candidate generator is one equi-join on cell ids and each
    * qualifying pair is emitted exactly once (no dedup pass). The
    * refine compares SQUARED distances (`dx²+dy² ≤ d²` — exact single
    * IEEE ops), and `dist` is one final sqrt.
    *
    * 100 TB shape: shuffle carries (id, x, y, cell) only; per-pair
    * work is three multiplies. Pick `cellSize` ≈ `d`: the disc bbox
    * then covers ≤ 9 cells, so the explode fan-out is O(1) per row. */
  def joinWithinDistance(a: DataFrame, aId: String, aGeom: String,
      b: DataFrame, bId: String, bGeom: String,
      d: Double, cellSize: Double): DataFrame = {
    require(d >= 0, s"d=$d")
    require(cellSize > 0, s"cellSize=$cellSize")
    val lhs = a.select(col(aId).as("id_a"),
        st.stx(col(aGeom)).as("__ax"), st.sty(col(aGeom)).as("__ay"))
      .withColumn("__cell", explode(flatten(transform(
        sequence(floor((col("__ax") - d) / cellSize).cast("long"),
          floor((col("__ax") + d) / cellSize).cast("long")), bx =>
          transform(
            sequence(floor((col("__ay") - d) / cellSize).cast("long"),
              floor((col("__ay") + d) / cellSize).cast("long")), by =>
            struct(bx.as("bx"), by.as("by")))))))
    val rhs = b.select(col(bId).as("id_b"),
        st.stx(col(bGeom)).as("__bx"), st.sty(col(bGeom)).as("__by"))
      .withColumn("__cell", struct(
        floor(col("__bx") / cellSize).cast("long").as("bx"),
        floor(col("__by") / cellSize).cast("long").as("by")))
    val dx = col("__ax") - col("__bx")
    val dy = col("__ay") - col("__by")
    // SHUFFLE_HASH, not broadcast: a small input here is an EXPLODED
    // side with O(1/cellSize²) fan-out and a single-file probe side —
    // Catalyst's size estimate would broadcast the 9×-exploded left and
    // run the probe at the parquet file's parallelism (near-serial on a
    // small file; a driver OOM at scale). Hash-partitioning both sides
    // on the cell key is the plan that survives 100 TB: candidate
    // generation and the distance refine parallelize with the shuffle
    // partition count on both ends.
    lhs.join(rhs.hint("shuffle_hash"), "__cell")
      .filter(dx * dx + dy * dy <= lit(d) * lit(d))
      .select(col("id_a"), col("id_b"), sqrt(dx * dx + dy * dy).as("dist"))
  }

  /** SELF distance join: every unordered pair of `pts` within Euclidean
    * distance `d`, as (id_a, id_b, dist) with id_a < id_b — the same
    * pair multiset as [[joinWithinDistance]](pts, pts) followed by an
    * `id_a < id_b` filter, at about half the candidate work.
    *
    * The generic form explodes the probe side to the FULL disc-bbox
    * neighborhood (9 cells at cellSize ≈ d), so every qualifying pair
    * is generated — and distance-refined — in BOTH orientations, and
    * the caller then discards half. Here the probe side covers only
    * its own cell plus the lexicographically FORWARD (bx, by) cells of
    * the bbox (5 of 9 at cellSize ≈ d). For two points in DIFFERENT
    * cells exactly one of the two cells precedes the other, so exactly
    * one orientation probes the other's cell; SAME-cell pairs are both
    * generated and dedup on id order. Each unordered pair therefore
    * pays the equi-join and the distance refine exactly once: ~5/9 of
    * the exploded shuffle rows, half the refines (guide §2.3/§3).
    * Orientation of a cross-cell emission follows cell order, not id
    * order, so the output normalizes with least/greatest. */
  def selfJoinWithinDistance(pts: DataFrame, idCol: String, geomCol: String,
      d: Double, cellSize: Double): DataFrame = {
    require(d >= 0, s"d=$d")
    require(cellSize > 0, s"cellSize=$cellSize")
    val base = pts.select(col(idCol).as("__id"),
      st.stx(col(geomCol)).as("__x"), st.sty(col(geomCol)).as("__y"))
    def cellOf(x: Column, y: Column) = struct(
      floor(x / cellSize).cast("long").as("bx"),
      floor(y / cellSize).cast("long").as("by"))
    val ownBx = floor(col("__x") / cellSize).cast("long")
    val ownBy = floor(col("__y") / cellSize).cast("long")
    // own cell first, then forward cells: bx rows strictly past own
    // take the disc bbox's full by range; the own-bx row starts at own
    val fwd = flatten(transform(
      sequence(ownBx, floor((col("__x") + d) / cellSize).cast("long")), bx =>
        transform(
          sequence(
            when(bx === ownBx, ownBy)
              .otherwise(floor((col("__y") - d) / cellSize).cast("long")),
            floor((col("__y") + d) / cellSize).cast("long")), by =>
          struct(bx.as("bx"), by.as("by")))))
    val lhs = base
      .withColumn("__cell", explode(fwd))
      .select(col("__id").as("id_a"), col("__x").as("__ax"),
        col("__y").as("__ay"), col("__cell"))
    val rhs = base.select(col("__id").as("id_b"),
      col("__x").as("__bx"), col("__y").as("__by"),
      cellOf(col("__x"), col("__y")).as("__cell"))
    val dx = col("__ax") - col("__bx")
    val dy = col("__ay") - col("__by")
    // recomputed from the carried coords (3 cheap ops) instead of
    // shuffling a second 16-byte struct per exploded row
    val sameCell = col("__cell") === cellOf(col("__ax"), col("__ay"))
    // same SHUFFLE_HASH rationale as joinWithinDistance: the exploded
    // side must not broadcast, and the probe side must not run at a
    // single small file's parallelism
    lhs.join(rhs.hint("shuffle_hash"), "__cell")
      .filter(dx * dx + dy * dy <= lit(d) * lit(d) &&
        (!sameCell || col("id_a") < col("id_b")))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        sqrt(dx * dx + dy * dy).as("dist"))
  }
}
