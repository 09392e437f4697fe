package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits over EVERY declared query (SURVEY §4): the
  * scale properties the scaladocs claim, machine-checked at sf0.001 —
  * no unplanned cartesian products anywhere, nested-loop joins only
  * where a broadcast of a tiny side is the intended plan, filters
  * pushed into the parquet scan, dimension joins broadcast.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // KNOWN LIMIT: ITERATIVE queries (connected-components family:
  // dedup_components, dedup_decision, sample_split; BPE/perceptron
  // training rounds) necessarily execute their loop at construction
  // and checkpoint between rounds — a loop cannot be one lazy plan —
  // so only their final-assembly plan is visible here. Their expensive
  // shared subplans ARE audited through non-iterative siblings that
  // expose the same operators lazily (dedup_jaccard = the exact pair
  // generation; dedup_containment = the one-sided index). Keep it that
  // way: a new iterative query should have a lazily-auditable sibling.
  private lazy val executed: Map[String, org.apache.spark.sql.execution.SparkPlan] =
    SparkEntry.queries.map { case (name, fn) =>
      val df = fn(spark, dir)
      df.collect() // finalize AQE so the audited plan is the executed one
      name -> df.queryExecution.executedPlan
    }

  private lazy val plans: Map[String, String] =
    executed.map { case (n, p) => n -> p.toString }

  // SparkPlan.collect cannot see INSIDE AQE: AdaptiveSparkPlanExec is
  // a LeafExecNode (as are query stages and cached-relation scans), so
  // a naive traversal audits nothing beneath the root of any plan with
  // an Exchange. Expand every wrapper kind explicitly.
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case i: InMemoryTableScanExec => allNodes(i.relation.cachedPlan)
      case _ => Seq.empty
    }
    (p +: p.children.flatMap(allNodes)) ++
      p.subqueries.flatMap(allNodes) ++ expanded
  }

  test("no CartesianProduct in any declared query") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("nested-loop joins only where a tiny broadcast side is intended") {
    // brute-force ANN scores corpus x queries (queries: 3 rows,
    // broadcast); the heat-island extract and the conservation ratio
    // cross-join one single-row aggregate into the stream; the mix
    // queries cross-join their single-row global-totals aggregate the
    // same way (sqrt6_total / corpus totals — 1 row by construction).
    // ann_recall embeds the brute-force scorer as its exact reference
    // (tiny broadcast query side, same contract as ann_bruteforce_topk)
    // grid_interp_levels brackets against a broadcast handful of target
    // pressure surfaces on an inequality condition — tiny side by
    // construction (a few standard levels)
    // q22 crosses the single-row decorrelated average-balance threshold
    // into the customer scan — 1 row by construction
    // text_bm25 / graph_domain_rank cross their single-row totals frame
    // (T/N/df, node count) into compact aggregates — 1 row by
    // construction; dedup_semantic broadcasts its numSeeds (=8) seed
    // vectors for the assignment argmax — driver-bounded by contract;
    // ann_pq_topk scans corpus CODES against the broadcast 3-row query
    // dist-table side (the ADC compressed-domain scan — same contract
    // as ann_bruteforce_topk at 1/64th the scan bytes)
    val allowed = Set("ann_bruteforce_topk", "ann_recall", "geo_heat_island",
      "geo_regrid_conservation", "grid_interp_levels", "q22_global_sales",
      "sample_domain_mix", "corpus_mix", "text_tfidf",
      "text_bm25", "graph_domain_rank", "dedup_semantic", "ann_pq_topk",
      "ann_pq_recall", // broadcast 20-query exact + ADC sides, as ann_recall
      "q11_important_value", // q11: 1-row national-total frame, as q22
      "cooccur_pairs", // 1-row corpus-total N crossed into pair counts
      "search_hybrid_rrf") // BM25 arm's 1-row totals frame, as text_bm25
    val offenders = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") && !allowed(n) => n
    }
    assert(offenders.isEmpty, s"unexpected nested-loop joins in: $offenders")
  }

  test("driver-materialized frames are model-sized in every declared query") {
    // A LocalTableScan is data the DRIVER holds and re-parallelizes —
    // the physical signature of a `.collect()`-backed stage. Legitimate
    // uses are models and parameters (IVF centroids, PQ codebooks,
    // target pressure levels, blocklist phrases): all driver-sized by
    // contract. A FUTURE query that collects a distributed intermediate
    // and re-parallelizes it lands here as a LocalTableScan with corpus-
    // shaped cardinality — fail it before it ships. The bound is 4096
    // rows: an order above the largest intended model frame (nlist,
    // codebook entries, seed centroids ≤ 256), orders below any corpus.
    import org.apache.spark.sql.execution.LocalTableScanExec
    val offenders = executed.toSeq.flatMap { case (n, p) =>
      allNodes(p).collect {
        case l: LocalTableScanExec if l.rows.length > 4096 =>
          s"$n: LocalTableScan of ${l.rows.length} rows"
      }
    }
    assert(offenders.isEmpty,
      s"collect-backed stages with corpus-shaped cardinality:\n${offenders.mkString("\n")}")
  }

  test("unpartitioned windows see only bounded frames in every declared query") {
    // A WindowExec with an empty partitionSpec funnels its ENTIRE input
    // through one task (Spark itself warns "No Partition Defined") — at
    // 100 TB that is a scale cliff unless the frame is bounded by
    // construction BEFORE the window. Every such window must be on this
    // whitelist with the bound that keeps it small:
    //   pack_shards       — cumulative shard offsets over the 2^16-id
    //                       bucket totals (rows = idSpace/65536, not the
    //                       corpus; Packing.packByBudget scaladoc)
    //   text_bm25         — row_number over the top-k frame AFTER
    //                       orderBy.limit(k) (Scoring.scala: the window
    //                       sees k rows, never the corpus)
    //   search_hybrid_rrf — RRF fusion over the full-outer join of two
    //                       top-k arms (≤ 2k rows) + its BM25 arm's
    //                       post-limit rank
    //   a_hist_quantiles  — cumulative counts over the ≤ nbins histogram
    //                       (Sketches.histogramQuantiles scaladoc)
    // A new query landing here unlisted is a scale regression: either
    // bound its frame (limit / aggregate first) or partition the window.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // name -> (justified bound, EXACT count of global windows justified):
    // counting keeps the exemption scoped to the windows that were
    // audited — a whitelisted query growing a SECOND global window (the
    // classic way a scale regression sneaks past a name-keyed skip
    // list) fails the audit like any other query would
    val allowed = Map(
      "pack_shards" -> ("bucketed offsets (idSpace/65536 rows)", 1),
      "text_bm25" -> ("post-limit(k) rank", 1),
      "search_hybrid_rrf" -> ("top-k arm fusion + its BM25 arm's rank", 2),
      "a_hist_quantiles" -> ("nbins histogram cumsum + total", 2))
    val globalWindows: Map[String, Int] = executed.toSeq.map { case (n, p) =>
      n -> allNodes(p).distinct.count {
        case w: WindowExec => w.partitionSpec.isEmpty
        case w: WindowGroupLimitExec => w.partitionSpec.isEmpty
        case _ => false
      }
    }.toMap
    val offenders = globalWindows.collect {
      case (n, c) if c > 0 && !allowed.contains(n) =>
        s"$n: $c unpartitioned window(s)"
      case (n, c) if allowed.contains(n) && c > allowed(n)._2 =>
        s"$n: $c unpartitioned windows, only ${allowed(n)._2} justified " +
          s"(${allowed(n)._1})"
    }
    assert(offenders.isEmpty,
      s"unbounded single-partition windows:\n${offenders.mkString("\n")}")
    // and the whitelist itself must stay live — a stale or over-counted
    // entry means the query was fixed/renamed and the exemption should go
    val stale = allowed.collect {
      case (n, (_, c)) if globalWindows.getOrElse(n, 0) < c => n
    }
    assert(stale.isEmpty, s"stale window whitelist entries: $stale")
  }

  test("nearest-cell runs the bucketed ring search, not a cross join") {
    // geo_nearest_cell formerly crossJoin(broadcast(centers))-scored
    // every pair; the ring-search kNN must keep every stage on hash
    // equi-joins (cell buckets + the winner join-back).
    val p = plans("geo_nearest_cell")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"geo_nearest_cell fell back to a cross join:\n$p")
  }

  test("selective scan pushes its filters into the parquet reader") {
    val p = plans("p_filter_scan")
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThanOrEqual"),
      s"no pushed filters in:\n$p")
  }

  test("fact-to-dimension joins broadcast the dimension side") {
    Seq("q3_top_revenue", "q5_nation_revenue", "q7_volume_shipping").foreach { q =>
      assert(plans(q).contains("BroadcastHashJoin"),
        s"$q: expected a broadcast hash join\n${plans(q)}")
    }
  }

  test("flagship curvilinear Voronoi pipeline avoids nested-loop fallbacks") {
    // The returned frame is the GeoJSON sink read-back; the compute
    // stages (tessellate -> filter -> daily stats -> join) run before
    // the sink and are covered by the sweep tests above. Here we pin
    // that nothing in the returned plan degenerated to a nested loop.
    val p = plans("grid_pipeline_voronoi")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"flagship plan fell back to a nested loop:\n$p")
  }

  test("pipeline_docprep keeps document text out of every shuffle") {
    // The exact-dedup stage must shuffle only (doc_id, digest) — at
    // 100 TB an Exchange whose input carries the text column moves the
    // whole corpus through one shuffle. AQE is disabled for the audit
    // so the physical tree exposes raw ShuffleExchangeExec nodes.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("pipeline_docprep")(spark, dir)
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "expected at least one shuffle in the plan")
      val offenders = exchanges.filter(
        _.child.output.exists(_.name.toLowerCase.contains("text")))
      assert(offenders.isEmpty,
        s"shuffles carrying document text:\n${offenders.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("docprep exact-dedup join-back is shuffle-free on a bucketed corpus") {
    // pipeline_docprep's scaladoc claims a doc_id-bucketed corpus makes
    // the winner join-back storage-partitioned at 100 TB. Prove it:
    // bucket the corpus by doc_id, run the docprep exact-dedup shape
    // (digest min-agg winners joined back on doc_id) with broadcast
    // DISABLED — the text side must flow from the bucketed scan into
    // the join with ZERO Exchange; the only shuffles carry the compact
    // (digest, doc_id) frames.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, dir, "documents")
    spark.sql("DROP TABLE IF EXISTS docs_b")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("docs_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val corpus = spark.table("docs_b")
      val winners = corpus
        .select(col("doc_id"), md5(col("text")).as("digest"))
        .groupBy("digest").agg(min("doc_id").as("doc_id"))
        .select(col("doc_id"), lit(true).as("keep_exact"))
      val joined = corpus.select(col("doc_id"), col("text"))
        .join(winners, Seq("doc_id"), "left")
      joined.collect()
      val offenders = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
            if e.child.output.exists(_.name.toLowerCase.contains("text")) => e
      }
      assert(offenders.isEmpty,
        s"bucketed join-back shuffled document text:\n${offenders.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_b")
    }
  }

  test("domain-mix thresholds broadcast back onto the corpus") {
    // The per-source threshold frame is #sources rows — joining it back
    // must be a broadcast hash join, never a shuffle of the corpus side
    // on `source` (a low-cardinality, skew-prone key at 100 TB).
    assert(plans("sample_domain_mix").contains("BroadcastHashJoin"),
      s"sample_domain_mix: threshold join did not broadcast\n${plans("sample_domain_mix")}")
  }

  test("mix/composition aggregations never shuffle document text") {
    // token counts are computed map-side (incl. the subword tokenizer);
    // the groupBy/window Exchanges must carry only grouping keys +
    // partial sums — and the substring-dedup gram pipeline only 8-byte
    // gram hashes + int positions.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Seq("sample_domain_mix", "corpus_mix", "pack_shards",
      "text_tokenize", "dedup_substring", "text_bm25",
      "text_classifier", "text_blocklist", "text_perceptron_train")
      .foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val offenders = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
            if e.child.output.exists(_.name.toLowerCase.contains("text")) => e
      }
      assert(offenders.isEmpty,
        s"$q: shuffles carrying document text:\n${offenders.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("bloom decontamination probes map-side, below the refine join") {
    // The bloom_might_contain filter must sit in the corpus-gram scan
    // stage (no Exchange between the gram explode and the probe), so a
    // 100 TB corpus is thinned before anything shuffles; document text
    // stays out of every Exchange; and the refine join broadcasts the
    // benchmark grams.
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("text_contamination_bloom")(spark, dir)
      val plan = df.queryExecution.executedPlan
      val probeFilters = plan.collect {
        case f: FilterExec if f.condition.toString.contains("bloom_might_contain") => f
      }
      assert(probeFilters.nonEmpty, s"no bloom probe in plan:\n$plan")
      // the probe's subtree must be exchange-free: it runs in the scan stage
      probeFilters.foreach { f =>
        val below = f.collect { case e: ShuffleExchangeExec => e }
        assert(below.isEmpty,
          s"bloom probe sits above a shuffle (not map-side):\n$f")
      }
      val textShuffles = plan.collect {
        case e: ShuffleExchangeExec
            if e.child.output.exists(_.name.toLowerCase.contains("text")) => e
      }
      assert(textShuffles.isEmpty,
        s"shuffles carrying document text:\n${textShuffles.mkString("\n")}")
      assert(plan.toString.contains("BroadcastHashJoin"),
        s"refine join did not broadcast the benchmark grams:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("pagerank power step joins the cached edge list without re-shuffling it") {
    // PageRank.ranks persists the edge⋈outdeg frame pre-partitioned on
    // src, so every power step's contribution join reads the cached
    // hash layout directly — no per-iteration edge Exchange at all
    // (stronger than the previous ReusedExchange pin). ranks() itself
    // ends with an eager localCheckpoint (so its loop caches can be
    // released safely), which blinds the graph_domain_rank plan here
    // (see KNOWN LIMIT above) — so pin the property at its source:
    // lay out one power step exactly as ranks() does and walk the
    // executed plan. AQE off for a deterministic tree shape.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // tiny audit frames would broadcast and hide the partitioning
    // question entirely — force the shuffle-family join path that the
    // real 1M-edge graph takes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = spark.range(1000).select(
          (col("id") % 97).cast("string").as("src"),
          ((col("id") + 13) % 89).cast("string").as("dst"))
        .distinct()
      val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
        .repartition(col("src")).persist()
      val r0 = ed.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1000000L).as("r"))
      val contrib = ed.join(r0, ed("src") === r0("node"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      contrib.collect()
      def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)
      val plan = contrib.queryExecution.executedPlan
      val join = nodes(plan).find(n => n.nodeName.contains("SortMergeJoin") ||
        n.nodeName.contains("ShuffledHashJoin"))
        .getOrElse(fail(s"no shuffle-family join in one power step:\n$plan"))
      // the ed side is the one whose subtree scans the cache (carries
      // outdeg); it must contain NO shuffle — the cached layout IS the
      // join layout
      val edSide = join.children.find(c =>
        nodes(c).exists(_.nodeName.contains("InMemoryTableScan")))
        .getOrElse(fail(s"no cached edge scan under the join:\n$plan"))
      val shuffles = nodes(edSide).filter(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles.isEmpty,
        s"power step re-shuffles the cached edge list:\n$plan")
      ed.unpersist()
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("aggregations run partial (map-side combine) before the shuffle") {
    Seq("q1_pricing_summary", "w1_events_daily").foreach { q =>
      assert(plans(q).contains("partial_"),
        s"$q: no partial aggregation in plan\n${plans(q)}")
    }
  }

  test("TPC-H sweep: every dimension join broadcasts (VERDICT r6 #7)") {
    // At SF-100TB the fact sides (lineitem/orders) dwarf every
    // dimension (region/nation/supplier/customer/part) by orders of
    // magnitude — a dimension that shuffles instead of broadcasting
    // turns a map-side join into a full-fact exchange. q1/q6 are pure
    // scans+aggs (no join); q13 is customer⋈orders (two big sides, a
    // shuffle join is the right plan); the rest must carry at least one
    // BroadcastHashJoin, and tiny-dim queries must not hash-shuffle
    // region/nation.
    val sweep = Seq("q2_min_cost", "q3_top_revenue", "q4_priority_check",
      "q5_nation_revenue", "q7_volume_shipping", "q8_market_share",
      "q9_profit_nation", "q10_returns", "q11_important_value",
      "q12_ship_modes", "q14_promo_share", "q15_top_supplier",
      "q16_part_suppliers", "q17_small_quantity", "q18_large_volume",
      "q19_disjunctive", "q20_promo_suppliers", "q21_waiting_supplier",
      "q22_global_sales")
    val noBroadcast = sweep.filterNot(q => plans(q).contains("BroadcastHashJoin"))
    assert(noBroadcast.isEmpty,
      s"TPC-H queries joining without any broadcast: $noBroadcast")
  }

  test("TPC-H heavy three (q9/q18/q21) combine map-side before shuffling") {
    // The three largest-intermediate queries of the sweep: their
    // aggregations must run partial_* below the exchange, or the
    // full fact table crosses the wire per group.
    Seq("q9_profit_nation", "q18_large_volume", "q21_waiting_supplier")
      .foreach { q =>
        assert(plans(q).contains("partial_"),
          s"$q: no partial aggregation in plan\n${plans(q)}")
      }
  }
}
