package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (north-star extension).
  *
  * Scale notes (100 TB): every variant is a single shuffle on a compact
  * key (16-byte digest / 4-byte band hash), never on the document text.
  * Map-side partial aggregation collapses duplicates before the shuffle,
  * so shuffle volume is O(distinct keys), not O(rows). MinHash/SimHash
  * signatures are computed inside WholeStageCodegen (pure column
  * expressions, no UDF / no Python).
  */
object Dedup {

  /** Exact dedup: keep the smallest id per content digest.
    * One hash-shuffle on md5(text) — the text column itself never
    * shuffles. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("digest"))
      .groupBy("digest")
      .agg(min(idCol).as(idCol), count(lit(1)).as("n_copies"))

  /** Normalized dedup: exact dedup over the case/punct/space-insensitive
    * fingerprint (TextAnalysis.fingerprint). */
  def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("digest"))
      .groupBy("digest")
      .agg(min(idCol).as(idCol), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of a document (sorted distinct). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val ngrams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_sort(array_distinct(ngrams))
  }

  /** MinHash signature: for each of `k` independent hash families, the
    * minimum over shingle hashes. hash(shingle, seed) uses Spark's
    * Murmur3 with per-family seed — deterministic across executors. */
  def minhashSignature(text: Column, n: Int, k: Int): Column = {
    val sh = shingles(text, n)
    array((0 until k).map { seed =>
      array_min(transform(sh, s => hash(s, lit(seed))))
    }: _*)
  }

  /** MinHash-LSH near-dup candidate pairs: band the k-row signature into
    * `bands` buckets, explode, equi-join on (band, bandHash) — the
    * classic banding scheme (Broder; MMDS ch.3). Returns candidate id
    * pairs (a < b) with their estimated Jaccard from full signatures.
    *
    * Scale: the join is a plain shuffle-hash equi-join on 8-byte keys;
    * candidate verification (signature agreement) happens before any
    * second shuffle; `.distinct` dedups pairs emitted by multiple bands.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4): DataFrame = {
    require(k % bands == 0,
      s"minhash signature length k=$k must be divisible by bands=$bands " +
        "or trailing components would be silently excluded from banding")
    val rows = k / bands
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), shingleN, k).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows)), lit(9999)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)) / lit(k.toDouble))
          .as("est_jaccard"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity between two shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** Exact pairwise n-gram Jaccard near-dup pairs above `threshold`.
    * O(n²) cross join — correctness baseline / small inputs only; the
    * scale path is [[minhashCandidates]] followed by this refine on the
    * candidate set. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash: 32-bit locality-sensitive fingerprint. For each bit, sum
    * +1/-1 votes of token hashes; bit set iff the vote is positive
    * (Charikar 2002). Pure column expressions. */
  def simhash(text: Column, bits: Int = 32): Column = {
    val toks = array_distinct(split(trim(lower(text)), "\\s+"))
    val bitCols = (0 until bits).map { i =>
      val vote = aggregate(toks, lit(0),
        (acc, t) => acc + when(shiftright(hash(t, lit(1234)), i).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
