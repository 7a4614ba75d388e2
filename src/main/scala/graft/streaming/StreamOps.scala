package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's operators: the same
  * calendar/window keys and dedup semantics, applied to an unbounded
  * `events` stream (`readStream` → transform → `writeStream`).
  *
  * Scale notes: watermarks bound all state; the windowed aggregate state is
  * O(open windows × groups); streaming dedup state is O(keys inside the
  * watermark horizon); sessionization state is O(open sessions). All are
  * partitioned by their grouping key — the shuffle story matches the batch
  * operators.
  */
object StreamOps {

  /** Tumbling/sliding windowed aggregate with a watermark — the streaming
    * form of the q24-style calendar rollup (window() instead of the
    * yearMonth key; late data beyond `watermarkDelay` is dropped).
    */
  def windowedCounts(events: DataFrame, tsCol: String, windowDur: String,
                     watermarkDelay: String, slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None => window(col(tsCol), windowDur)
    }
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("window_start"), col("win.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))
  }

  /** Streaming exact dedup on a content key within the watermark horizon —
    * the streaming form of `Dedup.exactDedup` (state is bounded by the
    * watermark; an unbounded `dropDuplicates` would grow forever).
    */
  def streamingDedup(events: DataFrame, tsCol: String, keyCols: Seq[String],
                     watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  // ---- gap-based sessionization (flatMapGroupsWithState) ----------------

  final case class Event(userId: Long, ts: Timestamp, eventType: String, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, n: Int, sum: Double)
  final case class Session(userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
                           nEvents: Int, sumValue: Double)

  /** Per-user gap-based sessionization: events more than `gapMs` apart
    * start a new session; completed sessions are emitted. Custom state via
    * `flatMapGroupsWithState` with ProcessingTimeTimeout flushing idle
    * sessions.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val done = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  done += Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutDuration(gapMs)
              case None => ()
            }
            done.result().iterator
          }
        })
  }
}
