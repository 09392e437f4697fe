package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a domain link graph — the corpus-curation signal a
  * web-scale training pipeline derives per host (rank a crawl's
  * domains, then gate or weight documents by their host's rank; the
  * companion of [[TextAnalysis.urlHosts]]'s blocklist gate).
  *
  * Semantics: the classic power iteration with damping d = 85/100,
  *   r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/outdeg(u)
  * in FIXED-POINT integer arithmetic (ranks are parts-per-`scale`
  * longs, every division an integral `div`) so a fixed iteration
  * count is bit-identical across engines — the [[graft.util.Exact]]
  * oracle discipline applied to an iterative algorithm. Dangling-node
  * mass is dropped, not redistributed (ranks then sum slightly below
  * `scale`; rank ORDER, which is what curation consumes, is
  * unaffected) — the common sparse-graph simplification, documented
  * here as the contract.
  *
  * 100 TB shape: the edge→outdeg join is computed ONCE and persisted
  * hash-partitioned on src, and the vertex list once partitioned on
  * node — each power step then shuffles ONLY its contribution groupBy
  * (map-side-combined, compact (host, long) rows): the contribution
  * join reads the cached edge layout directly and the rank rebuild
  * reads the cached vertex layout directly, with the previous step's
  * output already node-partitioned (plan-audited: one power step
  * carries no Exchange on the edge side). For deep iteration counts
  * (tens+), cut lineage with `localCheckpoint` every few rounds
  * exactly as [[Dedup]]'s connected components does; for a standing
  * crawl graph, persist `edges` bucketed by src so even the first
  * materialization shuffles nothing.
  */
object PageRank {

  /** Fixed-point PageRank after `iterations` power steps. Input edges
    * are deduplicated (a link graph, not a multigraph). Returns
    * (node, rank) with rank in parts-per-`scale`.
    *
    * `checkpointEvery` > 0 cuts lineage with a `localCheckpoint` every
    * that many steps — the [[Dedup]] connected-components discipline
    * for deep iteration counts, where an uncut plan tree grows one
    * join+agg layer per step and eventually dominates planning time.
    * Checkpointing does not change the fixed-point arithmetic, so
    * ranks are bit-identical with it on or off. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = 1000000000000L,
      checkpointEvery: Int = 0): DataFrame = {
    require(iterations >= 1 && iterations <= 100, "1..100 iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    // both loop-invariant frames are persisted PRE-PARTITIONED on
    // their join keys: the contribution join then pairs the cached
    // src-partitioned edge list with a rank frame that the previous
    // rebuild left node-partitioned, and the rank rebuild pairs the
    // cached node-partitioned vertex list with the node-partitioned
    // groupBy output — so each power step shuffles ONLY the
    // contribution groupBy, not the edge list or the vertex list
    // (without the cached layouts every step re-shuffled both)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nF = broadcast(nodes.agg(count(lit(1)).as("__n")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, "src")
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var r = nodes.crossJoin(nF)
      .select(col("node"), expr(s"${scale}L div __n").as("r"))
    for (i <- 1 to iterations) {
      val contrib = ed.join(r, ed("src") === r("node"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      r = nodes.crossJoin(nF).join(contrib, Seq("node"), "left")
        .select(col("node"),
          (expr(s"(15L * ${scale}L) div (100L * __n)") +
            expr("(85L * coalesce(c, 0L)) div 100L")).as("r"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iterations)
        r = r.localCheckpoint()
    }
    // materialize the result before releasing the loop caches — a lazy
    // return would silently recompute every power step uncached on the
    // caller's first action
    val out = r.select(col("node"), col("r").as("rank")).localCheckpoint()
    ed.unpersist(false)
    nodes.unpersist(false)
    out
  }
}
