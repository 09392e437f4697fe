package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Dev-only stage profiler for the 1M IVF/brute-force ANN path (not
  * part of the engine API; `sbt "runMain graft.tools.IvfProfile"`). */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfprofile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    val n = 1000000L
    val dim = 64
    val cid = col("id") % 256
    val vec = array((0 until dim).map { d =>
      ((hash(cid, lit(d)).cast("double") / 2147483647.0) +
        (hash(col("id"), lit(d + 1000)).cast("double") / 2147483647.0) * 0.1)
        .cast("float")
    }: _*)
    val corpus = spark.range(n).select(col("id"), vec.as("embedding"))
    val queries = corpus.filter(col("id") % 100000 === 7)

    timed("vec construction only")(corpus.agg(count(lit(1))).head().getLong(0))
    timed("vec materialize (sum first el)")(
      corpus.agg(sum(element_at(col("embedding"), 1))).head().getDouble(0))

    val cents: Array[Array[Float]] = corpus
      .filter(col("id") % (n / 64) === 0).orderBy("id").limit(64)
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)

    def cells(m: Int) = Bridge.column(graft.expressions.CentroidCells(
      Seq(Bridge.expression(col("embedding"))), cents, m))

    timed("assignment pass (kernel)")(
      corpus.select(element_at(cells(1), 1).as("cell"))
        .groupBy("cell").count().count())

    timed("lloyd sums (explode+agg)")(
      corpus.select(element_at(cells(1), 1).as("cell"),
        posexplode(Bridge.column(graft.expressions.FixedPointLongs(
          Seq(Bridge.expression(col("embedding"))), 1L << 24))))
        .groupBy("cell", "pos").agg(sum("col"), count(lit(1))).collect().length)

    timed("full ivfTopK")(
      graft.operators.Ann.ivfTopK(corpus, queries, "id", "embedding",
        10, nlist = 64, nprobe = 8, lloydIters = 1).count())

    val q = broadcast(queries.select(col("id").as("query_id"),
      col("embedding").as("qvec")))
    val c = corpus.select(col("id").as("neighbor_id"),
      col("embedding").as("cvec"))
    timed("bf: bnlj join only")(
      c.join(q, col("neighbor_id") =!= col("query_id")).count())
    timed("bf: join + dot only")(
      c.join(q, col("neighbor_id") =!= col("query_id"))
        .select(graft.operators.Ann.dot(col("qvec"), col("cvec")).as("d"))
        .agg(sum("d")).head().getDouble(0))
    timed("bf: join + cosine")(
      c.join(q, col("neighbor_id") =!= col("query_id"))
        .select(graft.operators.Ann.cosine(col("qvec"), col("cvec")).as("d"))
        .agg(sum("d")).head().getDouble(0))
    timed("brute force 10q x 1M")(
      graft.operators.Ann.bruteForceTopK(corpus, queries, "id", "embedding", 10)
        .count())

    val corpusP = corpus.persist()
    timed("persist corpus")(corpusP.count())
    val cP = corpusP.select(col("id").as("neighbor_id"),
      col("embedding").as("cvec"))
    timed("bf persisted: join + dot")(
      cP.join(q, col("neighbor_id") =!= col("query_id"))
        .select(graft.operators.Ann.dot(col("qvec"), col("cvec")).as("d"))
        .agg(sum("d")).head().getDouble(0))
    timed("bf persisted: full")(
      graft.operators.Ann.bruteForceTopK(corpusP, queries, "id", "embedding", 10)
        .count())

    spark.stop()
  }
}
