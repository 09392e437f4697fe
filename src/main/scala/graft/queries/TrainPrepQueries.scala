package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Packing, Sampling, TextAnalysis}

/** Training-data preparation over the `documents` table: deterministic
  * leakage-safe splits, benchmark decontamination, and the end-to-end
  * corpus-prep pipeline (the LLM-side flagship composition, mirroring
  * the geo-side `grid_pipeline_voronoi`).
  */
object TrainPrepQueries {

  type Q = (SparkSession, String) => DataFrame

  /** LEAKAGE-SAFE train/val/test split: hash the near-dup CLUSTER
    * representative (connected components over the exact Jaccard ≥ 0.5
    * graph), not the document id — near-duplicate documents land in the
    * same split by construction, so eval can't see training near-copies.
    * The assignment itself is a pure hash column (no shuffle beyond the
    * components computation; reproducible across engines and reruns). */
  val qSampleSplit: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val ids = docs.select(col("doc_id").cast("long").as("id"))
    val pairs = Dedup.jaccardPairsIndexed(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b")
    val bucket = Sampling.hashBucket(col("cluster_rep"), "split:", 100)
    Dedup.connectedComponents(ids, pairs)
      .select(col("id").as("doc_id"), col("cluster_rep"),
        bucket.as("bucket"))
      .withColumn("split", Sampling.assignSplit(col("bucket"), 80, 10))
      .orderBy("doc_id")
  }

  val qSampleSplitSql: String =
    TextQueries.componentsCtesSql + """
      |SELECT doc_id, cluster_rep, bucket,
      |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id, cluster_rep,
      |  ('0x'||substr(md5('split:'||cluster_rep),1,15))::BIGINT % 100 AS bucket
      |  FROM comp)
      |ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination: every corpus document sharing ≥1 word
    * 8-gram with the benchmark set (here: doc_id ≡ 0 mod 10 plays the
    * held-out eval suite) is flagged with its shared-gram count. */
  val qTextContamination: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    Dedup.ngramContamination(docs, "doc_id", "text",
        col("doc_id") % 10 === 0, n = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val qTextContaminationSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      |           FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |    ('0x'||substr(md5(array_to_string(list_slice(toks, i, i+7), ' ')),1,15))::BIGINT AS gh
      |  FROM t, unnest(range(1, greatest(len(toks)-8, 0)+2)) AS u(i)),
      |bg AS (SELECT DISTINCT gh FROM g WHERE doc_id % 10 = 0),
      |hits AS (SELECT g.doc_id, count(*) AS n_shared FROM g JOIN bg USING (gh)
      |         WHERE g.doc_id % 10 <> 0 GROUP BY 1)
      |SELECT d.doc_id, coalesce(h.n_shared, 0) AS n_shared,
      |  h.doc_id IS NOT NULL AS contaminated
      |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      |WHERE d.doc_id % 10 <> 0 ORDER BY 1""".stripMargin

  /** Decontamination through the broadcast-Bloom prefilter
    * ([[Dedup.ngramContaminationBloom]]): same exact output contract
    * as [[qTextContamination]] — the Bloom pass only thins the corpus
    * side before the exact-refine join, so the oracle is the plain
    * exact-join SQL over gram strings. 6-grams, doc_id ≡ 0 mod 9 as
    * the held-out benchmark. */
  val qTextContaminationBloom: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    Dedup.ngramContaminationBloom(docs, "doc_id", "text",
        col("doc_id") % 9 === 0, n = 6, expectedBenchGrams = 100000L)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val qTextContaminationBloomSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      |           FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |    array_to_string(list_slice(toks, i, i+5), ' ') AS gs
      |  FROM t, unnest(range(1, greatest(len(toks)-6, 0)+2)) AS u(i)),
      |bg AS (SELECT DISTINCT gs FROM g WHERE doc_id % 9 = 0),
      |hits AS (SELECT g.doc_id, count(*) AS n_shared FROM g JOIN bg USING (gs)
      |         WHERE g.doc_id % 9 <> 0 GROUP BY 1)
      |SELECT d.doc_id, coalesce(h.n_shared, 0) AS n_shared,
      |  h.doc_id IS NOT NULL AS contaminated
      |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      |WHERE d.doc_id % 9 <> 0 ORDER BY 1""".stripMargin

  /** The END-TO-END corpus-prep pipeline as ONE plan: language-ID →
    * quality gate (token count ≥ 20, ≥ 1 stopword) → exact dedup (min
    * doc_id per content digest, quality survivors only) → near-dup
    * dedup (MinHash-LSH candidates, exact-Jaccard refined, keep iff no
    * lower-id survivor is a near-dup) → per-document verdict trail.
    * Output is O(corpus): one row per document with every stage's flag,
    * which is exactly what a 100 TB prep job materializes for audit.
    *
    * Stage order matters and is the one a real pipeline uses: quality
    * first (cheap, codegen'd, prunes the corpus before any shuffle),
    * exact dedup second (one 16-byte-digest shuffle), near-dup last
    * (LSH banding over the by-then-smallest survivor set). */
  val qPipelineDocprep: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val flags = docs.select(col("doc_id"), col("text"),
      TextAnalysis.languageId(col("text")).as("lang_pred"),
      (TextAnalysis.tokenCount(col("text")) >= 20 &&
        TextAnalysis.stopwordCount(col("text")) >= 1).as("keep_quality"))
    // Exact dedup in the Dedup.exact shape: shuffle ONLY the 16-byte
    // digest + id (map-side projection), min-agg the winner per digest,
    // then join the compact winner-id frame back on doc_id. The text
    // column never enters an Exchange: the winner frame broadcasts at
    // bench scale, and at 100 TB a doc_id-bucketed corpus makes the
    // join storage-partitioned (a window over md5(text) can never avoid
    // pushing the full corpus text through one shuffle+sort).
    val quality = flags.filter(col("keep_quality"))
    val winners = quality
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .groupBy("digest").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(true).as("keep_exact"))
    // keep_exact ≡ "doc_id is a winner": winners are quality docs by
    // construction, so the verdict stage joins the compact winner frame
    // DIRECTLY (left join, null → false below) instead of routing
    // through a corpus-wide (quality ⋈ winners) intermediate — that
    // intermediate fed the verdict a second full-corpus join AND
    // duplicated the winner subtree in the plan (r17 fusion, VERDICT
    // r16 Next #4). The near-dup input keeps the text column via a
    // semi join on the same compact frame (winner ids are unique — one
    // min per digest — so semi ≡ the old inner-join-then-filter).
    val survivors = quality.select(col("doc_id"), col("text"))
      .join(winners.select("doc_id"), Seq("doc_id"), "left_semi")
    val dupIds = Dedup.minhashNearDups(survivors, "doc_id", "text", 3, 0.5)
      .select(col("id_b").as("dup_id")).distinct()
    flags.select(col("doc_id"), col("lang_pred"), col("keep_quality"))
      .join(winners, Seq("doc_id"), "left")
      .join(dupIds, col("doc_id") === col("dup_id"), "left")
      .select(col("doc_id"), col("lang_pred"), col("keep_quality"),
        coalesce(col("keep_exact"), lit(false)).as("keep_exact"),
        (coalesce(col("keep_exact"), lit(false)) && col("dup_id").isNull)
          .as("kept"))
      .orderBy("doc_id")
  }

  val qPipelineDocprepSql: String = {
    val langs = TextAnalysis.langMarkers.keys.toSeq.sorted
    val scoreDefs = langs.map { l =>
      val list = TextAnalysis.langMarkers(l).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> list_contains([$list], t))) AS s_$l"
    }.mkString(",\n      ")
    val m = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.reverse.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH flags AS (
       |  SELECT doc_id, text,
       |    CASE WHEN m <= 0 THEN 'und' $cases END AS lang_pred,
       |    keep_quality
       |  FROM (SELECT doc_id, text, $m AS m, keep_quality, * FROM (
       |    SELECT doc_id, text,
       |      $scoreDefs,
       |      (len(regexp_split_to_array(trim(text), '\\s+')) >= 20 AND
       |       len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
       |         t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) >= 1)
       |        AS keep_quality
       |    FROM (SELECT doc_id, text,
       |            regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |          FROM documents)))),
       |exact AS (
       |  SELECT doc_id, text,
       |    doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep_exact
       |  FROM flags WHERE keep_quality),
       |sh AS (
       |  SELECT doc_id, list_sort(list_distinct(
       |    list_transform(range(1, greatest(len(toks) - 3, 0) + 2),
       |      i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS s
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |        FROM exact WHERE keep_exact)),
       |ex AS (SELECT doc_id, len(s) AS ns, unnest(s) AS g FROM sh),
       |dups AS (
       |  SELECT DISTINCT ib AS doc_id FROM (
       |    SELECT b.doc_id AS ib, any_value(a.ns) AS na,
       |      any_value(b.ns) AS nb, count(*) AS inter
       |    FROM ex a JOIN ex b ON a.g = b.g
       |    WHERE a.doc_id < b.doc_id
       |      AND a.ns >= 0.5 * b.ns AND b.ns >= 0.5 * a.ns
       |    GROUP BY a.doc_id, b.doc_id)
       |  WHERE inter / greatest(na + nb - inter, 1)::DOUBLE >= 0.5)
       |SELECT f.doc_id, f.lang_pred, f.keep_quality,
       |  coalesce(e.keep_exact, false) AS keep_exact,
       |  (coalesce(e.keep_exact, false) AND d.doc_id IS NULL) AS kept
       |FROM flags f
       |LEFT JOIN exact e ON f.doc_id = e.doc_id
       |LEFT JOIN dups d ON f.doc_id = d.doc_id
       |ORDER BY 1""".stripMargin
  }

  /** Shared oracle snippet (append inside a `WITH RECURSIVE`): per-doc
    * subword piece counts under the demo vocab — greedy longest-match
    * restated as a recursion over DISTINCT words, weighted back by
    * occurrence count. The packing/mixing oracles consume `tok(doc_id,
    * n_tokens)` exactly where they previously used the whitespace
    * count. */
  private val tokCte: String =
    s"""vocab(piece) AS (VALUES ${TextAnalysis.demoVocabSqlPieces}),
       |pre AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
       |    '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS w FROM documents),
       |occ AS (SELECT doc_id, w, count(*) AS c FROM pre GROUP BY 1, 2),
       |dw AS (SELECT DISTINCT w FROM pre),
       |step(w, rest, k) AS (
       |  SELECT w, w, 0 FROM dw
       |  UNION ALL
       |  SELECT s.w, substr(s.rest, 1 + coalesce((SELECT max(length(v.piece))
       |      FROM vocab v WHERE substr(s.rest, 1, length(v.piece)) = v.piece), 1)),
       |    s.k + 1
       |  FROM step s WHERE s.rest <> ''),
       |enc AS (SELECT w, k FROM step WHERE rest = ''),
       |tok AS (SELECT o.doc_id, cast(sum(o.c * e.k) as bigint) AS n_tokens
       |  FROM occ o JOIN enc e ON o.w = e.w GROUP BY 1)""".stripMargin

  /** Sequence PACKING: every document's global token offset in the
    * id-ordered corpus and its fixed-budget training shard, via the
    * two-level scalable prefix sum ([[Packing.packByBudget]] — no
    * global window; bucketSize 64 exercises the multi-bucket path even
    * at sf0.001). Budgets count REAL subword pieces
    * ([[TextAnalysis.subwordTokenCount]] under the demo vocab, VERDICT
    * r5 #1) — the unit a training pipeline actually packs by. */
  val qPackShards: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val withTok = docs.select(col("doc_id"),
      TextAnalysis.subwordTokenCount(col("text"), TextAnalysis.demoVocab)
        .as("n_tokens"))
    Packing.packByBudget(withTok, "doc_id", "n_tokens",
        budget = 2048, bucketSize = 64)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val qPackShardsSql: String =
    s"""WITH RECURSIVE
       |$tokCte
       |SELECT doc_id, n_tokens,
       |  cast(coalesce(sum(n_tokens) OVER w, 0) as bigint) AS "offset",
       |  cast(coalesce(sum(n_tokens) OVER w, 0) // 2048 as bigint) AS shard
       |FROM tok
       |WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |ORDER BY doc_id""".stripMargin

  /** Temperature-weighted DOMAIN MIXING ([[Sampling.domainMixThresholds]]):
    * per-source √token-share acceptance thresholds toward a 20k-token
    * budget, then a deterministic per-document keep decision. One
    * groupBy over the corpus, thresholds broadcast back — the keep
    * column is a pure hash comparison, so re-running the mix on a
    * backfilled 100 TB corpus reproduces the same sample. */
  val qDomainMix: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.subwordTokenCount(col("text"), TextAnalysis.demoVocab)
          .cast("long")).as("n_toks"))
    val thr = Sampling.domainMixThresholds(perSource, tokenBudget = 20000)
      .select(col("source"), col("thr"))
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(thr), Seq("source"))
      .select(col("doc_id"), col("source"), col("thr"),
        (Sampling.hashBucket(col("doc_id"), "mix:", 10000) < col("thr"))
          .as("keep_mix"))
      .orderBy("doc_id")
  }

  val qDomainMixSql: String =
    s"""WITH RECURSIVE
      |$tokCte,
      |s AS (
      |  SELECT d.source, sum(t.n_tokens)::BIGINT AS n_toks
      |  FROM documents d JOIN tok t USING (doc_id) GROUP BY 1),
      |w AS (SELECT source, n_toks,
      |    cast(round(sqrt(n_toks) * 1e6) as bigint) AS sqrt6 FROM s),
      |tot AS (SELECT sum(sqrt6)::BIGINT AS sqrt6_total FROM w),
      |thr AS (SELECT source,
      |    least(cast(10000 as bigint), cast(round(
      |      (sqrt6::DECIMAL(38,0) * 20000 * 10000)::DOUBLE /
      |      (n_toks::DECIMAL(38,0) * sqrt6_total)::DOUBLE) as bigint)) AS thr
      |  FROM w, tot)
      |SELECT d.doc_id, d.source, t.thr,
      |  ('0x'||substr(md5('mix:'||d.doc_id),1,15))::BIGINT % 10000 < t.thr
      |    AS keep_mix
      |FROM documents d JOIN thr t USING (source)
      |ORDER BY d.doc_id""".stripMargin

  /** STRATIFIED fixed-k sample ([[Sampling.stratifiedSample]]): the 20
    * smallest-salted-hash documents per language — eval-set drawing
    * with per-stratum quotas, via the bounded-heap top-k aggregate
    * (map-side partials, k·strata shuffle rows; no per-stratum sort
    * window). */
  val qStratifiedSample: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    Sampling.stratifiedSample(docs, "lang", "doc_id", "strat:", 20)
      .orderBy("lang", "rank")
  }

  val qStratifiedSampleSql: String =
    """WITH h AS (SELECT lang, doc_id,
      |    ('0x'||substr(md5('strat:'||doc_id),1,12))::BIGINT AS h48
      |  FROM documents),
      |r AS (SELECT lang, doc_id, h48,
      |    row_number() OVER (PARTITION BY lang ORDER BY h48, doc_id) AS rank
      |  FROM h)
      |SELECT lang, rank, doc_id, h48 FROM r WHERE rank <= 20
      |ORDER BY lang, rank""".stripMargin

  /** DSIR-style importance resampling (Sampling.importanceResample):
    * re-weight the corpus toward a target unigram distribution — the
    * data-selection recipe for domain-targeted training mixes. The
    * target vocab up-weights three query-ish tokens; scores, capped
    * acceptance rates and the salted-hash keep verdicts are all exact
    * integers, so the oracle replays the sample row for row. */
  val qImportanceResample: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    Sampling.importanceResample(docs, "doc_id", "text",
        Seq("spark" -> 500L, "window" -> 300L, "query" -> 200L), "dsir:")
      .orderBy("doc_id")
  }

  val qImportanceResampleSql: String =
    """WITH tv(tok, tc) AS (VALUES
      |  ('spark', 500), ('window', 300), ('query', 200)),
      |toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
      |    AS tok FROM documents),
      |raw AS (SELECT tok, cast(count(*) as bigint) AS rc
      |  FROM toks GROUP BY 1),
      |r AS (SELECT t.doc_id,
      |    ((coalesce(v.tc, 0) + 1) * 1000000) // (raw.rc + 1) AS ratio
      |  FROM toks t JOIN raw ON t.tok = raw.tok
      |  LEFT JOIN tv v ON t.tok = v.tok),
      |s AS (SELECT doc_id, cast(sum(ratio) // count(*) as bigint) AS score
      |  FROM r GROUP BY 1)
      |SELECT doc_id, score, least(1000000, score) AS accept_ppm,
      |  ('0x'||substr(md5('dsir:'||doc_id),1,15))::BIGINT % 1000000
      |    < least(1000000, score) AS keep
      |FROM s ORDER BY doc_id""".stripMargin

  /** CORPUS COMPOSITION: per (source, language) document/token counts
    * and shares — the mixture report every training-data pipeline
    * publishes next to its shards. One map-side-partial groupBy; the
    * global totals re-aggregate the tiny grouped frame and broadcast
    * back, so shares are single exact-operand double divisions (no
    * order-dependent double accumulation — hash-stable vs the oracle). */
  val qCorpusMix: Q = (spark, dir) => {
    val docs = Tables(spark, dir, "documents")
    val g = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.subwordTokenCount(col("text"), TextAnalysis.demoVocab)
          .cast("long")).as("n_toks"))
    val tot = g.agg(sum("n_docs").as("td"), sum("n_toks").as("tt"))
    g.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"), col("n_toks"),
        (col("n_docs").cast("double") / col("td")).as("doc_share"),
        (col("n_toks").cast("double") / col("tt")).as("tok_share"))
      .orderBy("source", "lang")
  }

  val qCorpusMixSql: String =
    s"""WITH RECURSIVE
      |$tokCte,
      |g AS (
      |  SELECT d.source, d.lang, count(*)::BIGINT AS n_docs,
      |    sum(t.n_tokens)::BIGINT AS n_toks
      |  FROM documents d JOIN tok t USING (doc_id) GROUP BY 1, 2),
      |t AS (SELECT sum(n_docs)::BIGINT AS td, sum(n_toks)::BIGINT AS tt FROM g)
      |SELECT source, lang, n_docs, n_toks,
      |  n_docs / td::DOUBLE AS doc_share,
      |  n_toks / tt::DOUBLE AS tok_share
      |FROM g, t ORDER BY source, lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "sample_split" -> qSampleSplit,
    "sample_domain_mix" -> qDomainMix,
    "sample_stratified" -> qStratifiedSample,
    "sample_importance" -> qImportanceResample,
    "corpus_mix" -> qCorpusMix,
    "text_contamination" -> qTextContamination,
    "text_contamination_bloom" -> qTextContaminationBloom,
    "pipeline_docprep" -> qPipelineDocprep,
    "pack_shards" -> qPackShards)

  val oracles: Map[String, String] = Map(
    "sample_split" -> qSampleSplitSql,
    "sample_domain_mix" -> qDomainMixSql,
    "sample_stratified" -> qStratifiedSampleSql,
    "sample_importance" -> qImportanceResampleSql,
    "corpus_mix" -> qCorpusMixSql,
    "text_contamination" -> qTextContaminationSql,
    "text_contamination_bloom" -> qTextContaminationBloomSql,
    "pipeline_docprep" -> qPipelineDocprepSql,
    "pack_shards" -> qPackShardsSql)
}
