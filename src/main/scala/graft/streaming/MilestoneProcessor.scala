package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary-state v2 processor behind q_stream_tws: one named
  * `ValueState[Long]` per key holding the cumulative row count, with a
  * (key, milestone) emission each time the count crosses another
  * multiple of `every`. The emission SET is invariant to how the
  * source micro-batches — every multiple ≤ total is crossed exactly
  * once — which is what lets the streaming result sit under the same
  * DuckDB hash gate as the batch entries.
  *
  * This is the `transformWithState` surface (Spark 4's successor to
  * `flatMapGroupsWithState`): state is declared as named handles on
  * `getHandle` inside `init` (here with no TTL — the harness stream is
  * bounded; production unbounded key spaces would pass a `TTLConfig`),
  * and RocksDB is the required store provider.
  */
class MilestoneProcessor(every: Long)
    extends StatefulProcessor[Long, Long, (Long, Long)] {

  @transient private var cnt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Long],
      timers: TimerValues): Iterator[(Long, Long)] = {
    val before = if (cnt.exists()) cnt.get() else 0L
    val after = before + rows.size
    cnt.update(after)
    ((before / every + 1) to (after / every))
      .map(k => (key, k * every)).iterator
  }
}
