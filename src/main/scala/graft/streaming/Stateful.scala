package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming via `flatMapGroupsWithState` (the brief's
  * "KeyValueGroupedDataset.mapGroupsWithState/flatMapGroupsWithState for
  * custom state"): per-key running statistics that survive across
  * micro-batches — the streaming analogue of a grouped aggregate whose
  * state the engine manages explicitly (checkpointable, timeout-aware).
  */
object Stateful {

  case class KeyedValue(key: Long, value: Double)
  case class RunningStats(key: Long, n: Long, total: Double, max: Double)

  /** Per-key cumulative (count, sum, max) emitted after every
    * micro-batch that touches the key. Append-mode compatible. */
  def runningStats(events: Dataset[KeyedValue]): Dataset[RunningStats] = {
    implicit val statsEnc = Encoders.product[RunningStats]
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[KeyedValue], state: GroupState[RunningStats]) => {
          val prev = state.getOption.getOrElse(RunningStats(key, 0L, 0.0, Double.MinValue))
          val next = rows.foldLeft(prev) { (s, r) =>
            RunningStats(key, s.n + 1,
              // fixed-point cents so the running total is order-robust
              (math.rint(s.total * 100) + math.rint(r.value * 100)) / 100,
              math.max(s.max, r.value))
          }
          state.update(next)
          Iterator.single(next)
        })
  }
}
