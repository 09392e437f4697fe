package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.geom.st

/** Distributed k-nearest-neighbor over point geometries via grid-bucket
  * ring search — the scale path for "nearest cell center" lookups
  * (SURVEY §2.3 J-breadth; the reference's single-machine equivalent is
  * GeoPandas `sjoin_nearest`-style R-tree probing, in-RAM only).
  *
  * The brute-force shape (`crossJoin(broadcast(centers))`, kept as the
  * test oracle in `GeoQueries`) dies the moment the center frame stops
  * broadcasting: at 100 TB a points × centers cartesian is the
  * textbook scale-killer. Here both sides land on the same fixed grid
  * used by [[SpatialJoin]]: centers hash to their single cell (one
  * 16-byte key, no replication), and each still-unresolved point
  * explodes to the square of cells within ring radius `r`, equi-joins
  * to the center cells, and keeps its best k via the bounded-heap
  * [[graft.expressions.TopKByScore]] — partial aggregation keeps the
  * shuffle at k rows per point.
  *
  * A point is DONE after round `r` (rings 0..r examined) when either
  *  - it holds ≥ k candidates and its kth distance ≤ r·cellSize — any
  *    unexamined center sits in a cell at Chebyshev ring ≥ r+1, hence
  *    at planar distance ≥ r·cellSize, so the heap can no longer
  *    change; or
  *  - its square already covers the centers' entire cell bounding box
  *    (every center examined — handles k > |centers| and far-outlier
  *    points).
  * Unresolved points re-enter the next round with doubled radius, so
  * total explode work stays geometric in the final radius; resolved
  * points leave via an anti-join on the id. Iteration count is
  * O(log(span/cellSize)) with a loud `maxRounds` guard.
  *
  * Ties are deterministic end-to-end: lower distance wins, equal
  * distance → smaller center id (TopKByScore's ordering).
  *
  * Pick `cellSize` near the typical center spacing: much smaller
  * wastes rounds on empty rings; much larger scans too many centers
  * in round one.
  */
object SpatialKnn {

  /** For each point row, the k nearest centers. `points` must carry a
    * unique id in `pointIdCol`; both geometry columns must be points.
    * Returns `(pointIdCol, rank 1-based, centerIdCol, dist)` — one row
    * per neighbor found (fewer than k if |centers| < k).
    */
  def knn(points: DataFrame, pointIdCol: String, pointGeomCol: String,
      centers: DataFrame, centerIdCol: String, centerGeomCol: String,
      k: Int, cellSize: Double, maxRounds: Int = 16): DataFrame = {
    require(k > 0, s"k=$k")
    require(cellSize > 0, s"cellSize=$cellSize")

    val ctr = centers.select(
      col(centerIdCol).cast("long").as("__cid"),
      st.stx(col(centerGeomCol)).as("__cx"),
      st.sty(col(centerGeomCol)).as("__cy"))
      .withColumn("__cell", struct(
        floor(col("__cx") / cellSize).cast("long").as("bx"),
        floor(col("__cy") / cellSize).cast("long").as("by")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val b = ctr.agg(
      min("__cell.bx"), max("__cell.bx"),
      min("__cell.by"), max("__cell.by")).head()
    require(!b.isNullAt(0), "centers frame is empty")
    val (minBx, maxBx, minBy, maxBy) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))

    val pts0 = points.select(
      col(pointIdCol),
      st.stx(col(pointGeomCol)).as("__px"),
      st.sty(col(pointGeomCol)).as("__py"),
      floor(st.stx(col(pointGeomCol)) / cellSize).cast("long").as("__pcx"),
      floor(st.sty(col(pointGeomCol)) / cellSize).cast("long").as("__pcy"))

    var resolved: DataFrame = null
    var remaining = pts0.persist(StorageLevel.MEMORY_AND_DISK)
    // loop on a COUNT carried across rounds (r16 opt): the former
    // `while (!remaining.isEmpty)` ran one extra limit-1 job per round
    // on top of the count each round already pays to materialize the
    // next `remaining` — same decisions, one action per round fewer
    var remainingCnt = remaining.count()
    var r = 1L
    var round = 0
    while (remainingCnt > 0) {
      round += 1
      require(round <= maxRounds,
        s"spatial kNN did not converge in $maxRounds rounds " +
          s"(radius ${r} cells) — raise cellSize or maxRounds")
      val cells = flatten(transform(
        sequence(col("__pcx") - r, col("__pcx") + r), bx =>
          transform(sequence(col("__pcy") - r, col("__pcy") + r), by =>
            struct(bx.as("bx"), by.as("by")))))
      val dx = col("__px") - col("__cx")
      val dy = col("__py") - col("__cy")
      val agg = remaining
        .withColumn("__cell", explode(cells))
        .join(ctr, "__cell")
        .withColumn("__dist", sqrt(dx * dx + dy * dy))
        .groupBy(col(pointIdCol), col("__pcx"), col("__pcy"))
        .agg(Ann.topK(-col("__dist"), col("__cid"), k).as("__top"))
      val covered =
        col("__pcx") - r <= minBx && col("__pcx") + r >= maxBx &&
        col("__pcy") - r <= minBy && col("__pcy") + r >= maxBy
      val settled =
        size(col("__top")) >= k &&
        -col("__top").getItem(k - 1).getField("cos_sim") <= r * cellSize
      val done = agg.filter(covered || settled)
        .select(col(pointIdCol), posexplode(col("__top")))
        .select(col(pointIdCol), (col("pos") + 1).as("rank"),
          col("col.neighbor_id").as(centerIdCol),
          (-col("col.cos_sim")).as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      done.count() // materialize before remapping `remaining`
      resolved = if (resolved == null) done else resolved.union(done)
      val prev = remaining
      // left_anti never duplicates its left side, so the done-id frame
      // needs no distinct pass (k rows per resolved point are fine)
      remaining = prev
        .join(done.select(col(pointIdCol)), Seq(pointIdCol), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      remainingCnt = remaining.count()
      prev.unpersist()
      r *= 2
    }
    remaining.unpersist()
    ctr.unpersist()
    if (resolved == null) // points frame was empty: 0-row result, right schema
      pts0.limit(0).select(col(pointIdCol), lit(1).as("rank"),
        lit(0L).as(centerIdCol), lit(0.0).as("dist"))
    else resolved
  }
}
