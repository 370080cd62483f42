package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value) — additive north-star scope
  * (BASELINE.json; the reference has no streaming surface at all).
  *
  * Every transform takes a DataFrame and works identically on a batch frame
  * or a `readStream` frame — the Spark way to keep one definition for
  * backfill and live paths. Watermarks bound state (late rows beyond the
  * watermark are dropped, state for closed windows is evicted), which is
  * what makes these runnable indefinitely on an unbounded stream.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark. */
  def tumblingStats(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Hopping (sliding) window counts/sums per event type: overlapping
    * windows of `windowLen` starting every `slide` — each event lands in
    * windowLen/slide windows. Same watermark-bounded state story as
    * [[tumblingStats]]; works identically on batch frames (backfill).
    */
  def hoppingStats(events: DataFrame, windowLen: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Windowed OHLC bars — the streaming face of
    * [[graft.operators.TimeSeries.ohlcBars]]: tumbling watermarked windows
    * per event type, Open/Close picked on the UNIQUE (ts, event_id)
    * ordering via min_by/max_by so the bars are bit-stable across engines
    * AND across micro-batch boundaries (every agg here merges
    * associatively, so state is one narrow row per open window and
    * arrival order can't change a closed bar). Late data beyond the
    * watermark is dropped; works identically on batch frames (backfill —
    * the gate's oracle face).
    */
  def windowOhlc(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("o"),
        max(col("value")).as("h"),
        min(col("value")).as("l"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("c"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("o"), col("h"), col("l"), col("c"), col("n"))

  /** Session windows (gap-based) per user. */
  def sessionStats(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful aggregation via mapGroupsWithState: a running per-user
    * event count + value sum that emits the updated state on every trigger.
    * (The hand-rolled-state escape hatch for semantics windowed aggs can't
    * express; state here is O(1) per user.)
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** Watermarked stream-stream join: attribute each purchase to the same
    * user's clicks in the preceding `windowSeconds`. Both sides carry
    * watermarks and the join condition bounds event-time distance, so each
    * side's state buffer is evicted once the other side's watermark passes
    * the window — the canonical bounded-state stream-stream join.
    *
    * `joinType = "left_outer"` answers the equally common OUTER question —
    * purchases with NO prior click: an unmatched purchase is emitted with
    * null click columns only once the click side's watermark has passed its
    * window, i.e. when it is provably unmatched rather than merely
    * unmatched so far (the engine cannot retract rows, so outer emission
    * must wait for the watermark). Identical semantics to a batch left join
    * on the same predicate, which is what the st07 gate row checks.
    * `"full_outer"` additionally surfaces clicks that never led to a
    * purchase (null purchase columns, same watermark-gated emission on the
    * other side); `user_id` is coalesced from whichever side is present —
    * a no-op for inner/left rows. The st08 gate row checks the batch face.
    */
  def purchaseAttribution(
      events: DataFrame,
      watermark: String,
      windowSeconds: Int,
      joinType: String = "inner"): DataFrame = {
    // fail fast with the operator's name: other join types either drop
    // columns from the final select silently (semi) or die deep inside the
    // streaming planner with an opaque error (right_outer needs the state
    // roles swapped) — same convention as requireIntegralId / checkCodes
    require(Set("inner", "left_outer", "full_outer").contains(joinType),
      s"purchaseAttribution: joinType must be 'inner', 'left_outer' or 'full_outer', got '$joinType'")
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowSeconds SECONDS"),
      joinType)
      .select(col("purchase_id"), coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"), col("value"))
  }

  /** Streaming exact dedup: drop rows whose `keyCols` were already seen
    * within the watermark horizon. State is bounded by the watermark (keys
    * older than it are evicted), which is what makes dedup runnable on an
    * unbounded stream — the streaming counterpart of
    * [[graft.operators.Dedup.dedupExact]] for ingest pipelines.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String, keyCols: String*): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keyCols.toSeq)
    else
      // batch backfill of the same pipeline (Spark rejects
      // dropDuplicatesWithinWatermark on batch frames): on a bounded input
      // the watermark horizon covers everything, so within-horizon dedup is
      // plain global dedup on the keys
      events.dropDuplicates(keyCols.toSeq)

  final case class SessionSummary(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  final case class CusumPoint(
      event_type: String, ts: Timestamp, event_id: Long,
      cusum_scaled: Long, is_change: Boolean)
  final case class CusumState(rs: Long, minRs: Long)

  /** Streaming one-sided CUSUM level-shift monitor per event_type — the
    * ONLINE form of [[graft.operators.TimeSeries.cusumChangepoints]]: the
    * reference level is a FIXED `target` (trained from history — the
    * trained-literal pattern; an online detector cannot know the stream's
    * own mean), and the recursion carries two Longs of state per key:
    * `rs = Σ(x − target − slack)` and its running min (both on the 1e-6
    * integer grid, so replay/retry produce identical bits). Emits one
    * scored point per event: `S = rs − min(0, min rs)`, flagged when
    * `S > threshold`.
    *
    * Ordering contract (the st06 rule): rows sort by (ts, event_id)
    * WITHIN a trigger; across triggers arrival must respect event time —
    * ordered replay in tests, watermark-ordered sources in production.
    * State is O(1) per key; per-trigger buffering is one group's batch.
    * Batch execution runs each group once from empty state, which equals
    * the closed form `RS_t − min(0, min_{j≤t} RS_j)` — the SQL-statable
    * face the st16 gate row hash-checks.
    */
  def streamCusum(
      events: Dataset[Event],
      target: Double,
      slack: Double,
      threshold: Double): Dataset[CusumPoint] = {
    import events.sparkSession.implicits._
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val tM = micro(target)
    val sM = micro(slack)
    val hM = micro(threshold)
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Event], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            val rs = st.rs + (micro(e.value) - tM - sM)
            st = CusumState(rs, math.min(st.minRs, rs)) // minRs includes RS_0=0
            val s = rs - st.minRs
            CusumPoint(key, e.ts, e.event_id, s, s > hM)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Gap-based sessionization via flatMapGroupsWithState: accumulates an
    * open session per user and EMITS it (zero or one row) only when the
    * event-time timeout fires — i.e. the user went quiet for `gapMs`. The
    * flatMap variant is what allows emitting nothing while a session is
    * still open; state is one small struct per active user, evicted on
    * timeout.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      // batch backfill: batch execution of flatMapGroupsWithState never
      // fires event-time timeouts, so each user's FINAL open session would
      // never be emitted. The same gap semantics are SQL-expressible — lag +
      // cumulative session flag — and on bounded input "the user went quiet"
      // eventually holds for every session, so this window-function plan
      // equals the streaming output once all timeouts have fired. Gap
      // comparison is at MILLISECOND resolution (unix_millis), matching the
      // streaming path's Timestamp.getTime arithmetic exactly.
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("ts")
      // tolerate TIMESTAMP_NTZ inputs: unix_millis requires TIMESTAMP, and
      // under a UTC session the cast is instant-preserving (no-op for LTZ)
      val tsMs = unix_millis(col("ts").cast("timestamp"))
      return events.toDF()
        .withColumn("__prev_ms", lag(tsMs, 1).over(byUser))
        .withColumn("__new_session",
          when(col("__prev_ms").isNull ||
            tsMs - col("__prev_ms") > gapMs, 1L).otherwise(0L))
        .withColumn("__sid", sum("__new_session")
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("__sid"))
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"), sum("value").as("total_value"))
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .as[SessionSummary]
    }
    events
      .withWatermark("ts", s"${gapMs / 1000} seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionSummary]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // user went quiet: close and emit the session
            val closed = state.get
            state.remove()
            Iterator.single(closed)
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val cur = state.getOption
            var out = List.empty[SessionSummary]
            var open = cur
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts.getTime - s.session_end.getTime <= gapMs =>
                  // out-of-order rows within the watermark must never move
                  // the session boundaries backwards
                  val newEnd = if (e.ts.after(s.session_end)) e.ts else s.session_end
                  val newStart = if (e.ts.before(s.session_start)) e.ts else s.session_start
                  open = Some(s.copy(session_start = newStart, session_end = newEnd,
                    n_events = s.n_events + 1, total_value = s.total_value + e.value))
                case Some(s) => // gap exceeded inside the batch: emit, start anew
                  out ::= s
                  open = Some(SessionSummary(uid, e.ts, e.ts, 1L, e.value))
                case None =>
                  open = Some(SessionSummary(uid, e.ts, e.ts, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.session_end.getTime + gapMs)
            }
            out.reverseIterator
          }
      }
  }

  /** Stream-static enrichment: left-join a (possibly streaming) event frame
    * with a STATIC dimension table — the standard "decorate the live stream
    * with reference data" topology. Spark broadcasts the static side against
    * each micro-batch; no state, no watermark (static-side snapshot
    * semantics — Spark re-plans the dim scan per batch, so a replaced
    * parquet dim is picked up without restarting the query). Left join keeps
    * events whose key misses the dim (null dim columns) — monitoring wants
    * the miss visible, not dropped. The batch face is the identical plan,
    * which is what the st11 gate row hash-checks.
    */
  def enrichWithDim(
      events: DataFrame,
      dim: DataFrame,
      eventKey: String,
      dimKey: String,
      dimCols: Seq[String]): DataFrame =
    events.join(
      broadcast(dim.select((dimKey +: dimCols).map(col): _*)),
      col(eventKey) === col(dimKey), "left_outer")
      .drop(dimKey)

  /** Convenience: wire a streaming frame to an in-memory sink for tests or
    * a console sink for demos; caller stops the query.
    */
  def toMemorySink(df: DataFrame, name: String, complete: Boolean): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(if (complete) OutputMode.Complete else OutputMode.Append)
      .start()
}
