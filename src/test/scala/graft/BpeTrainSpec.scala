package graft

import org.apache.spark.sql.functions.col

import graft.operators.{BpeTrain, TextAnalysis}

/** Pins [[BpeTrain.learnMerges]] against a hand-computed corpus.
  *
  * Corpus (one doc): "lower lowest low low newer newest new"
  * Word counts: lower=1, lowest=1, low=2, newer=1, newest=1, new=1.
  * Round 0 pair counts (chars): (l,o)=4, (o,w)=4, (n,e)=3, (e,w)=3+2*...
  *   l o w e r | l o w e s t | l o w ×2 | n e w e r | n e w e s t | n e w
  *   (l,o)=4 (o,w)=4 (w,e)=2+..: lower,lowest → 2; newer/newest/new:
  *   n-e,e-w pairs... full counts below in the test comments.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learns merges in corpus-frequency order with lexicographic ties") {
    // words: lower(1) lowest(1) low(2) newer(1) newest(1) new(1)
    // round 0 adjacent char pairs, corpus-weighted:
    //   (e,r)=2 (e,s)=2 (e,w)=3 (l,o)=4 (n,e)=3 (o,w)=4 (s,t)=2 (w,e)=4
    //   max=4 tie {(l,o),(o,w),(w,e)} -> lexicographic "l o" wins
    // round 1 (after l+o): (e,r)=2 (e,s)=2 (e,w)=3 (lo,w)=4 (n,e)=3
    //   (o,w)=0 (s,t)=2 (w,e)=4 -> tie {(lo,w),(w,e)} -> "lo w"
    // round 2 (after lo+w): (e,r)=2 (e,s)=2 (e,w)=3 (low,e)=2 (n,e)=3
    //   (s,t)=2 (w,e)=2 -> tie {(e,w),(n,e)} at 3 -> "e w"
    val docs = Seq("lower lowest low low newer newest new").toDF("text")
    val got = BpeTrain.learnMerges(docs, "text", 3)
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((0L, "l o", 4L), (1L, "lo w", 4L), (2L, "e w", 3L)))
  }

  test("learned merges drive the encoder to the expected segmentation") {
    val docs = Seq("lower lowest low low newer newest new").toDF("text")
    val merges = BpeTrain.learnMerges(docs, "text", 4)
      .select("pair").as[String].collect().toSeq
      .map { p => val Array(a, b) = p.split(" ", 2); (a, b) }
    // build a vocab of chars + merge results and encode "low" -> one piece
    val vocab = (('a' to 'z').map(_.toString) ++
      merges.map { case (a, b) => a + b }).distinct
    val pieces = Seq("low new").toDF("t")
      .select(TextAnalysis.bpeTokenize(col("t"), vocab, merges).as("ids"))
      .as[Seq[Int]].head()
      .map(i => vocab(i))
    assert(pieces.head === "low", s"expected 'low' as one piece: $pieces")
  }

  test("stops early when no adjacent pairs remain") {
    val docs = Seq("a b c").toDF("text") // all single-char words
    val got = BpeTrain.learnMerges(docs, "text", 5).count()
    assert(got === 0L)
  }

  test("all three training paths produce the identical merge sequence") {
    // driver-incremental (default), distributed-incremental (forced by
    // driverWordLimit=0), and the k-full-recount reference implementation
    // must agree bit for bit — k=12 spans a localCheckpoint boundary
    // (every 8 rounds) in the distributed path.
    val d = Tables(spark, "/root/testdata/sf0.001", "documents").limit(60)
    val local = BpeTrain.learnMerges(d, "text", 12)
      .as[(Long, String, Long)].collect().toSeq
    val dist = BpeTrain.learnMerges(d, "text", 12, driverWordLimit = 0)
      .as[(Long, String, Long)].collect().toSeq
    val recount = BpeTrain.learnMergesRecount(d, "text", 12)
      .as[(Long, String, Long)].collect().toSeq
    assert(local === recount, "driver-incremental diverged from recount")
    assert(dist === recount, "distributed-incremental diverged from recount")
    assert(local.length === 12)
  }

  test("distributed-incremental path handles early exhaustion") {
    val docs = Seq("ab ab cd").toDF("text")
    // pairs: (a,b)=2, (c,d)=1 -> 2 merges then exhaustion
    val got = BpeTrain.learnMerges(docs, "text", 5, driverWordLimit = 0)
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((0L, "a b", 2L), (1L, "c d", 1L)))
  }

  test("matches the unrolled SQL oracle's first merges on real data") {
    // The full-gate check runs at sf0.01; pin sf0.001 here so the
    // spec catches drift at the smallest scale too.
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val got = BpeTrain.learnMerges(d, "text", 2)
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((0L, "e r", 4650L), (1L, "o r", 2880L)))
  }
}
