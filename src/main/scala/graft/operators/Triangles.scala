package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over the crawl/link graph — the local-clustering
  * companion to [[PageRank]] (global importance) and
  * `Dedup.connectedComponents` (reachability). Host-graph triangle
  * density separates organic link neighborhoods from spam farms and
  * mirror rings, the published use of clustering coefficients in
  * web-corpus curation.
  *
  * Algorithm: degree-ordered edge orientation (the node-iterator /
  * "forward" algorithm of the published triangle-listing literature).
  * Every undirected edge is oriented from its lower-(degree, id)
  * endpoint to the higher; a triangle {u,v,w} is then found EXACTLY
  * once, as the wedge u→v, u→w (rank v < rank w) closed by v→w.
  *
  * 100 TB shape: three equi-joins and two map-side-combined
  * aggregates, all on node keys — no node ever sees more than its own
  * adjacency. The orientation bounds every out-degree by O(√m), so
  * the wedge fan-out per task is bounded even under TOTAL hub skew: a
  * pure star contributes ZERO wedges, because every spoke orients INTO
  * the hub (ScaleBench stage 18 drives a 100k-degree hub through this
  * path). Wedge candidates carry node-id pairs only.
  */
object Triangles {

  /** (node, triangles) for every node on ≥ 1 triangle of the
    * UNDIRECTED simple graph induced by `edges` (direction dropped,
    * self-loops and duplicate/reversed edges removed). */
  def perNodeCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient light → heavy; a < b canonically, so a degree tie keeps
    // a → b and the rank order (d, id) stays total
    val oriented = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"),
        when(col("da") <= col("db"), col("db")).otherwise(col("da")).as("dv"))
    // each wedge once: u's two out-neighbors ordered by (degree, id)
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") &&
          (col("x.dv") < col("y.dv") ||
            (col("x.dv") === col("y.dv") && col("x.v") < col("y.v"))))
      .select(col("x.u").as("u"), col("x.v").as("v"), col("y.v").as("w"))
    val tris = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
