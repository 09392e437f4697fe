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
  * 100 TB shape: edges joined to ranks on src, contributions
  * map-side-combined into a groupBy(dst), ranks rebuilt by one left
  * join per iteration — three hash shuffles per iteration, all on
  * compact (host, long) rows. The edge→outdeg join is performed ONCE
  * up front; because every iteration composes into one plan, the
  * identical edge-side exchanges are deduplicated by Spark's
  * ReuseExchange rule rather than re-shuffled per iteration. For deep
  * iteration counts (tens+), cut lineage with `localCheckpoint` every
  * few rounds exactly as [[Dedup]]'s connected components does; for a
  * standing crawl graph, persist `edges` bucketed by src so no
  * iteration shuffles the edge list at all.
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
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nF = broadcast(nodes.agg(count(lit(1)).as("__n")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, "src")
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
    r.select(col("node"), col("r").as("rank"))
  }
}
