package graft

import graft.queries.StreamingQueries

/** RocksDB state-store option: the same streaming queries, the same
  * results, with state on executor-local disk instead of the heap
  * (the 100 TB keyspace path — heap-bounded state OOMs there). */
class RocksDbStateStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withRocks[A](f: => A): A = {
    sys.props("graft.stateStore") = "rocksdb"
    try f finally sys.props.remove("graft.stateStore")
  }

  test("flag routes stateful queries onto the RocksDB provider") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.get(provKey) // the session default provider
    assert(!StreamingQueries.useRocksDb)
    withRocks {
      assert(StreamingQueries.useRocksDb)
      // inside the helper, the provider conf must be live...
      StreamingQueries.withStatePartitions(spark, 4) {
        assert(spark.conf.get(provKey) == StreamingQueries.RocksDbProvider)
      }
    }
    // ...and restored to the pre-call provider after
    assert(spark.conf.get(provKey) == before)
  }

  test("windowed aggregation and sessionization match under RocksDB") {
    // memory-provider baseline, then the identical replay on RocksDB —
    // stream/batch parity is already gated; this pins provider parity
    // (and that the suite actually RUNS on RocksDB state).
    Seq("stream_events_daily", "stream_sessions").foreach { q =>
      val base = SparkEntry.queries(q)(spark, dir).collect().toSeq
      val rocks = withRocks {
        SparkEntry.queries(q)(spark, dir).collect().toSeq
      }
      assert(rocks == base, s"$q: RocksDB result diverged")
      assert(base.nonEmpty)
    }
  }
}
