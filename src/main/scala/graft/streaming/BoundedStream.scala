package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Shared harness for the oracle-checked streaming entries: run a
  * streaming frame to COMPLETION (`Trigger.AvailableNow`) into a named
  * memory sink and hand back the sink table for the batch-equality
  * check. Used by q_stream_window and q_stream_dedup — one place for
  * the sink/trigger/state-sizing conventions instead of two drifting
  * copies.
  *
  * State-store partition count is frozen from `shuffle.partitions` at
  * first start, and the stateful key spaces here are dozens of keys —
  * CPU-count partitions would spin one HDFS-backed store instance per
  * partition (init + per-batch commit each) to hold a handful of rows
  * apiece. Size state to the key space, not the CPU count; on a real
  * cluster this knob is set per-stream the same way. The conf is
  * restored only AFTER termination because the first micro-batch plans
  * asynchronously after `start()`, and that planning is what reads it.
  */
object BoundedStream {
  def runToTable(s: SparkSession, stream: DataFrame, name: String,
      outputMode: String, statePartitions: Int = 4): DataFrame = {
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = stream.writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name)
  }
}
