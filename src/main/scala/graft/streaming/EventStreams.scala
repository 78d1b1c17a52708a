package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import java.sql.Timestamp

/** Structured Streaming surface over the `events` schema (SURVEY.md §2.8 —
  * all [X]: the reference has no streams; its only asynchronous feature is
  * completion-order iteration, core.py:167-169, covered by
  * [[graft.api.DelayedObjs]]).
  *
  * Every transform here takes a DataFrame that may be bounded OR unbounded
  * (`spark.readStream` / MemoryStream) — the same declarative plan serves
  * both, which is exactly the Structured Streaming contract. Tests feed
  * MemoryStream batches (incl. late rows) and assert sink contents;
  * the batch-equivalent aggregations are oracle-checked in
  * [[graft.operators.EventOps]].
  *
  * Scale notes: every stateful op keys by user_id or window — state is
  * partitioned by the shuffle and bounded by the watermark (Spark drops
  * window/dedup state older than the watermark); `mapGroupsWithState` uses
  * an explicit processing-time timeout so abandoned keys expire.
  */
object EventStreams {

  /** Tumbling-window counts with a watermark: late events beyond 10 min
    * are dropped, window state is purged as the watermark passes. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding windows (1h every 30m). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("cnt"))

  /** Session windows with a 30-min inactivity gap per user — the streaming
    * twin of EventOps.q32 (same end-exclusive gap semantics). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("sess_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Watermarked exact dedup on event_id — the streaming form of
    * `dropDuplicates`: state holds ids only within the watermark horizon. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Stream-static join: enrich a stream with a static dimension (the
    * broadcast-join analog for unbounded input). */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Stream-STREAM interval join: match each left event with right events
    * for the same user within [0, maxGap] after it. Both sides carry
    * watermarks and the join has an explicit time-range condition, so
    * Spark can bound the buffered state on both sides and evict rows as
    * the watermarks pass — without the range bound, stream-stream joins
    * must buffer forever (the planner rejects them in Append mode). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   watermark: String = "10 minutes",
                   maxGap: String = "30 minutes"): DataFrame = {
    val l = left.select(col("user_id"), col("ts").as("l_ts"), col("value").as("l_value"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"))
      .select(col("user_id"), col("l_ts"), col("r_ts"), col("l_value"), col("r_value"))
  }

  final case class UserMax(user_id: Long, max_value: Double)

  /** Spark 4's `transformWithState` processor: per-user running maximum in
    * a typed `ValueState`. Unlike `mapGroupsWithState`, the new API gives
    * named composable state variables (value/list/map), per-state TTL so
    * idle keys expire without a timeout dance, and timers — and it
    * requires the RocksDB state store, which spills to disk instead of
    * holding all keys on-heap: the difference between "state fits in
    * executor memory" and "state fits on executor disk" at 100 TB
    * key cardinalities. */
  class MaxValueProcessor extends StatefulProcessor[Long, Ev, UserMax] {
    @transient private var maxState: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      maxState = getHandle.getValueState[Double]("max",
        org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[UserMax] = {
      val prev = if (maxState.exists()) maxState.get() else Double.NegativeInfinity
      val mx = rows.foldLeft(prev)((m, e) => math.max(m, e.value))
      maxState.update(mx)
      Iterator.single(UserMax(key, mx))
    }
  }

  /** Per-user running max via [[MaxValueProcessor]]. Requires
    * `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider on the session. */
  def runningMax(events: Dataset[Ev])(implicit spark: SparkSession): Dataset[UserMax] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new MaxValueProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** foreachBatch sink with IDEMPOTENT batch-id partitioning — the
    * arbitrary-sink escape hatch done exactly-once: Spark replays a failed
    * micro-batch under the SAME batchId, and `mode(Overwrite)` into a
    * per-batch directory makes the replay a no-op rewrite instead of a
    * duplicate append. This is the standard recipe for sinks with no
    * native transactional writer (JDBC upserts, external indexes): key
    * the write on (checkpoint, batchId). */
  def foreachBatchParquet(events: DataFrame, path: String,
                          checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch=$id")
      }
      .start()

  /** In-flight data-quality metrics via `observe()`: row counts and
    * violation counters computed inside the SAME pass that processes the
    * data (accumulator-backed, no second scan — at 100 TB a separate
    * quality-check job doubles the read). Metrics surface per micro-batch
    * in `StreamingQueryProgress.observedMetrics` (streaming) or via
    * `QueryExecutionListener` (batch). */
  def observed(events: DataFrame): DataFrame =
    events.observe("graft_metrics",
      count(lit(1)).as("n_rows"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_neg_value"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_null_user"))

  final case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  final case class SessionEvent(user_id: Long, kind: String, at: Timestamp)

  /** flatMapGroupsWithState — the generator-shaped stateful op: emits ZERO
    * OR MORE rows per group per batch (here: a "milestone" row every 3rd
    * event per user, none otherwise), state carries the running count. */
  def milestones(events: Dataset[Ev])(implicit spark: SparkSession): Dataset[SessionEvent] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, SessionEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[SessionEvent]()
          rows.foreach { ev =>
            n += 1
            if (n % 3 == 0) out += SessionEvent(uid, s"milestone_$n", ev.ts)
          }
          state.update(n)
          out.iterator
      }
  }

  /** Custom per-user running state via mapGroupsWithState — the
    * `KeyValueGroupedDataset` stateful escape hatch (arbitrary state the
    * built-in windows can't express). At scale, pair a timeout policy
    * (ProcessingTime/EventTime) with this so idle keys' state expires;
    * NoTimeout keeps micro-batch tests deterministic. */
  def runningTotals(events: Dataset[Ev])(implicit spark: SparkSession): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, total) = rows.foldLeft((prev.n, prev.total)) {
            case ((c, t), ev) => (c + 1, t + ev.value)
          }
          val next = UserRunning(uid, n, total)
          state.update(next)
          next
      }
  }
}
