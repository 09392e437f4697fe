package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Murmur3HashFunction}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** minhash_sig over PRE-HASHED shingles (array<long>, e.g. the sorted
  * xxhash64 arrays the near-dup refine already caches) — the k-family
  * MinHash signature in one compiled pass, hashing each 8-byte long
  * instead of re-walking the shingle string.
  *
  * Same construction as [[MinHashSig]] (shared [[MinHashSigBase]])
  * with the string base hash swapped for the long one:
  * h1 = murmur3(elem: long, 42), then each family f takes min over
  * murmur3(f: int, h1). A DIFFERENT but equally sound LSH family —
  * banding/collision probabilities are family-independent, and every
  * consumer of these signatures refines candidates with exact Jaccard
  * before emitting, so downstream outputs (and their oracles, which
  * state the exact-pairs semantics) are unchanged. Callers that need
  * the historical string family keep [[MinHashSig]].
  *
  * Why it pays: the near-dup pipeline needs BOTH a signature and a
  * refine-ready hashed set per document. Deriving the signature from
  * the hashed longs lets one persisted array<long> column serve both —
  * the cache shrinks from multi-word shingle strings to 8 bytes per
  * shingle, the refine joins shuffle the small arrays, and the base
  * hash walks 8 fixed bytes instead of ~20-char strings.
  *
  * Null and empty inputs both yield the non-null array of k nulls,
  * mirroring [[MinHashSig]]'s contract (shared eval path).
  */
case class MinHashSigLong(child: Expression, k: Int) extends MinHashSigBase {
  require(k >= 1, s"k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
        // baseHash reads arr.getLong(i) without an isNullAt check — a
        // null element would read an undefined 0 and silently diverge
        // from the documented hash(x, seed) parity. The in-repo
        // producer (SortedXxHash64Array) declares containsNull=false;
        // anything else must prove the same before using this family.
        "minhash_sig_long needs array<bigint> with non-null elements " +
          "(containsNull=false)")
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig_long needs array<bigint>, got ${t.sql}")
    }

  override protected def baseHash(arr: ArrayData, i: Int): Long =
    Murmur3HashFunction.hash(arr.getLong(i), LongType, 42L)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigLong =
    copy(child = newChild)
}
