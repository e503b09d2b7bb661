package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessionState(startMs: Long, lastMs: Long, nEvents: Long)

/** Structured Streaming surface. The reference has no streaming framework
  * (SURVEY.md §2.10) — its analogue is combiner-based incremental index
  * maintenance; here both that (IncrementalIndex) and the standard
  * event-stream shapes (windowed aggregation with watermark, stateful
  * sessionization) are first-class.
  *
  * All functions take/return streaming DataFrames — callers plug in any
  * source (`readStream` Kafka/files; MemoryStream in tests) and sink.
  */
object EventStreams {

  /** Tumbling event-time window counts with a watermark for state expiry
    * and late-data handling. At scale: state is bounded by
    * (#windows-in-watermark × #event types); partial aggregation applies
    * before the shuffle.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionUpdate(user_id: Long, session_start: Timestamp, n_events: Long, closed: Boolean)

  /** Per-user sessionization (30-min inactivity gap) via
    * flatMapGroupsWithState — the custom-state path the reference has no
    * analogue for. State per user is O(1); timeout closes idle sessions.
    */
  def sessionize(
      spark: SparkSession,
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      // ProcessingTimeTimeout closes idle sessions eagerly but makes the
      // stream re-trigger on a timer (nondeterministic in tests); off by
      // default — gap detection alone is complete for bounded replays.
      useTimeout: Boolean = false): Dataset[SessionUpdate] = {
    import spark.implicits._
    val timeoutConf =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(userId, new Timestamp(s.startMs), s.nEvents, closed = true))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur    = state.getOption
            val out    = Seq.newBuilder[SessionUpdate]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(lastMs = t, nEvents = s.nEvents + 1))
                case Some(s) =>
                  out += SessionUpdate(userId, new Timestamp(s.startMs), s.nEvents, closed = true)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
              out += SessionUpdate(userId, new Timestamp(s.startMs), s.nEvents, closed = false)
            }
            out.result().iterator
          }
        })
  }

  /** Streaming exact dedup at ingest: keep the first arrival of each
    * content hash, drop duplicates that arrive within the watermark
    * horizon. This is the streaming face of `Dedup.exactGroups` — a
    * training-data pipeline dedups at ingest so duplicates never reach
    * storage.
    *
    * State posture at scale: `dropDuplicatesWithinWatermark` keys state
    * by the 256-bit content hash (never the document text) and expires
    * each key once the watermark passes its arrival time, so state is
    * bounded by (ingest rate × watermark), independent of corpus
    * history. Exact global dedup over all history instead composes the
    * batch `exactGroups` over the landed table — unbounded keyed state
    * in the stream is the one shape a 100 TB pipeline must not hold.
    */
  def dedupStream(docs: DataFrame, eventTime: String, watermark: String): DataFrame =
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark(eventTime, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-stream interval join — the attribution shape: each `right`
    * event (e.g. a purchase) joins the `left` events of the SAME user
    * that happened in the `windowMs` BEFORE it (e.g. the clicks that led
    * there). Both sides carry watermarks and the join condition bounds
    * event time in BOTH directions, so Spark can expire buffered state:
    * per-side state is (ingest rate × (watermark + window)), independent
    * of stream history — the only admissible stream-stream join shape at
    * 100 TB (an unbounded-time join would buffer a side forever).
    * Inner join: unmatched rows expire silently.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      key: String = "user_id", eventTime: String = "ts",
      watermark: String = "1 hour", windowMs: Long = 30 * 60 * 1000L): DataFrame = {
    val l = left.withWatermark(eventTime, watermark)
      .select(col(key).as("l_key"), col(eventTime).as("l_ts"),
        col("event_type").as("l_type"), col("event_id").as("l_id"))
    val r = right.withWatermark(eventTime, watermark)
      .select(col(key).as("r_key"), col(eventTime).as("r_ts"),
        col("event_type").as("r_type"), col("event_id").as("r_id"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("l_ts") <= col("r_ts") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL ${windowMs / 1000} SECONDS"))
      .select(col("l_key").as("user_id"), col("l_id"), col("l_type"),
        col("r_id"), col("r_type"), col("l_ts"), col("r_ts"))
  }
}
