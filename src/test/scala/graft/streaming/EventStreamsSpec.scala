package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streamCusum: split replay over a MemoryStream equals the one-batch closed form") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 6 points at 10 then 6 at 20 against target 12, slack 1: S pins at 0
    // pre-shift (deviation −3), then climbs +7 per point — the state
    // (rs, minRs) must carry EXACTLY across micro-batches
    val events = (0 until 12).map(i =>
      Event(i.toLong, ts(i), 1, "k", if (i < 6) 10.0 else 20.0))
    val input = MemoryStream[Event]
    val out = streamCusum(input.toDS(), target = 12.0, slack = 1.0, threshold = 20.0)
    val q = toMemorySink(out.toDF(), "cusum_test", complete = false)
    try {
      input.addData(events.take(4): _*) // mid-level split
      q.processAllAvailable()
      input.addData(events.slice(4, 9): _*) // split straddles the shift
      q.processAllAvailable()
      input.addData(events.drop(9): _*)
      q.processAllAvailable()
      val streamed = spark.table("cusum_test")
        .select("event_id", "cusum_scaled", "is_change").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
      // one-batch batch-face execution = the closed form
      val batch = streamCusum(events.toDS(), 12.0, 1.0, 20.0)
        .collect().map(p => (p.event_id, p.cusum_scaled, p.is_change)).sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq, s"\nstream=${streamed.mkString(",")}\nbatch=${batch.mkString(",")}")
      // shape: zero before the shift, +7e6/point after, flag crosses at 20
      assert(batch.take(6).forall(_._2 == 0L))
      assert(batch.drop(6).map(_._2).toSeq == (1 to 6).map(_ * 7000000L))
      assert(batch.count(_._3) == 4, batch.mkString(",")) // 21, 28, 35, 42 > 20
    } finally q.stop()
  }

  test("tumblingStats over a MemoryStream aggregates per window and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val agg = tumblingStats(input.toDF(), "10 minutes", "5 minutes")
    val q = toMemorySink(agg, "tumbling_test", complete = false)
    try {
      input.addData(
        Event(1, ts(1), 1, "click", 1.0),
        Event(2, ts(2), 1, "click", 2.0),
        Event(3, ts(11), 2, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first two windows
      input.addData(Event(4, ts(40), 1, "click", 1.0))
      q.processAllAvailable()
      // a very late event for the first (closed) window: must be dropped
      input.addData(Event(5, ts(1), 9, "click", 99.0))
      q.processAllAvailable()
      input.addData(Event(6, ts(55), 1, "click", 1.0)) // push watermark past 40
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select("window_start", "event_type", "n", "total").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0))) // late row NOT counted
      assert(rows.contains(("2024-01-01 10:10:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("windowOhlc: open/close stable across micro-batch arrival order; late rows dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val agg = windowOhlc(input.toDF(), "10 minutes", "5 minutes")
    val q = toMemorySink(agg, "ohlc_test", complete = false)
    try {
      // the LATEST event of the first bar arrives in the FIRST micro-batch,
      // earlier ones later — close must still come from the max (ts, id)
      input.addData(Event(3, ts(9), 1, "click", 4.0))
      q.processAllAvailable()
      input.addData(
        Event(1, ts(1), 1, "click", 7.0),  // open (earliest)
        Event(2, ts(5), 1, "click", 9.0))  // high
      q.processAllAvailable()
      input.addData(Event(4, ts(40), 2, "view", 0.0)) // close the bar
      q.processAllAvailable()
      // late event for the closed bar: dropped, bar unchanged
      input.addData(Event(5, ts(2), 9, "click", 99.0))
      q.processAllAvailable()
      input.addData(Event(6, ts(55), 2, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ohlc_test")
        .select("window_start", "event_type", "o", "h", "l", "c", "n").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 7.0, 9.0, 4.0, 4.0, 3L)),
        rows.toString)
    } finally q.stop()
  }

  test("hoppingStats: each event counts in every overlapping window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val agg = hoppingStats(input.toDF(), "10 minutes", "5 minutes", "5 minutes")
    val q = toMemorySink(agg, "hopping_test", complete = false)
    try {
      input.addData(
        Event(1, ts(7), 1, "click", 1.0), // windows [10:00,10:10) and [10:05,10:15)
        Event(2, ts(12), 1, "click", 2.0)) // windows [10:05,10:15) and [10:10,10:20)
      input.addData(Event(3, ts(40), 2, "view", 0.0)) // close them
      q.processAllAvailable()
      val rows = spark.table("hopping_test")
        .select("window_start", "event_type", "n", "total").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 1L, 1.0)), rows.toString)
      assert(rows.contains(("2024-01-01 10:05:00.0", "click", 2L, 3.0)), rows.toString) // both events overlap here
      assert(rows.contains(("2024-01-01 10:10:00.0", "click", 1L, 2.0)), rows.toString)
    } finally q.stop()
  }

  test("sessionStats groups events within the gap into one session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val agg = sessionStats(input.toDF(), "5 minutes", "10 minutes")
    val q = toMemorySink(agg, "session_test", complete = false)
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(3), 1, "view", 2.0),  // same session (gap 3 < 5)
        Event(3, ts(20), 1, "click", 4.0) // new session
      )
      q.processAllAvailable()
      input.addData(Event(4, ts(59), 2, "click", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .select("user_id", "n_events", "total_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)))
      assert(rows.contains((1L, 1L, 4.0)))
    } finally q.stop()
  }

  test("runningUserTotals keeps per-user state across triggers") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val running = runningUserTotals(input.toDS())
    val q = running.writeStream.format("memory").queryName("running_test")
      .outputMode("update").start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.5))
      q.processAllAvailable()
      input.addData(Event(2, ts(1), 1, "view", 2.5))
      q.processAllAvailable()
      val latest = spark.table("running_test")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest == Set((1L, 2L, 4.0)))
    } finally q.stop()
  }

  test("purchaseAttribution joins purchases to preceding clicks only, within the window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val joined = purchaseAttribution(input.toDF(), "10 minutes", windowSeconds = 5 * 60)
    val q = toMemorySink(joined, "attr_test", complete = false)
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 0.0),
        Event(2, ts(3), 1, "purchase", 9.99), // click 3 min earlier: attributed
        Event(3, ts(10), 1, "purchase", 5.0), // click 10 min earlier: outside 5-min window
        Event(4, ts(2), 2, "purchase", 1.0))  // other user, no click
      q.processAllAvailable()
      input.addData(Event(5, ts(59), 3, "click", 0.0)) // advance watermarks
      q.processAllAvailable()
      val rows = spark.table("attr_test")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((2L, 1L)))
    } finally q.stop()
  }

  test("purchaseAttribution left_outer: unmatched purchases emit null clicks after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val joined = purchaseAttribution(input.toDF(), "10 minutes",
      windowSeconds = 5 * 60, joinType = "left_outer")
    val q = toMemorySink(joined, "attr_outer_test", complete = false)
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 0.0),
        Event(2, ts(3), 1, "purchase", 9.99), // click 3 min earlier: attributed
        Event(3, ts(10), 1, "purchase", 5.0), // click outside the 5-min window: null
        Event(4, ts(2), 2, "purchase", 1.0))  // no click at all: null
      q.processAllAvailable()
      // the unmatched rows may only appear once the watermark proves no
      // matching click can still arrive. The GLOBAL watermark is the MIN
      // across both per-side watermark nodes, and each side only sees its
      // own event type — so the sweep must advance clicks AND purchases
      // (a clicks-only sweep leaves the purchase watermark, and with it
      // state eviction, frozen)
      input.addData(Event(5, ts(50), 9, "click", 0.0), Event(6, ts(50), 9, "purchase", 0.0))
      q.processAllAvailable()
      input.addData(Event(7, ts(59), 9, "click", 0.0), Event(8, ts(59), 9, "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table("attr_outer_test")
        .where(col("user_id") =!= 9) // the sweep user's own rows are scaffolding
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows == Set((2L, 1L), (3L, -1L), (4L, -1L)), rows.toString)
    } finally q.stop()
  }

  test("purchaseAttribution full_outer: both unmatched sides emit null-padded after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val joined = purchaseAttribution(input.toDF(), "10 minutes",
      windowSeconds = 5 * 60, joinType = "full_outer")
    val q = toMemorySink(joined, "attr_full_test", complete = false)
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 0.0),
        Event(2, ts(3), 1, "purchase", 9.99), // attributed pair
        Event(4, ts(2), 2, "purchase", 1.0),  // purchase, no click: null click side
        Event(5, ts(1), 3, "click", 0.0))     // click, no purchase: null purchase side
      q.processAllAvailable()
      // advance BOTH per-side watermarks (global watermark = min)
      input.addData(Event(6, ts(50), 9, "click", 0.0), Event(7, ts(50), 9, "purchase", 0.0))
      q.processAllAvailable()
      input.addData(Event(8, ts(59), 9, "click", 0.0), Event(9, ts(59), 9, "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table("attr_full_test")
        .where(col("user_id") =!= 9)
        .select("purchase_id", "user_id", "click_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      // user_id is coalesced, so the unmatched CLICK row still carries its user
      assert(rows == Set((2L, 1L, 1L), (4L, 2L, -1L), (-1L, 3L, 5L)), rows.toString)
    } finally q.stop()
  }

  test("dedupWithinWatermark drops repeated keys inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val dedup = dedupWithinWatermark(input.toDF(), "10 minutes", "event_id")
    val q = toMemorySink(dedup, "dedup_test", complete = false)
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // duplicate key within horizon
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(1, ts(3), 1, "click", 1.0)) // still within horizon
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id").as[Long].collect().toList
      assert(ids.sorted == List(1L, 2L))
    } finally q.stop()
  }

  test("sessionize emits a session only after the user goes quiet for the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val sessions = sessionize(input.toDS(), gapMs = 5 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("sessionize_test")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(3), 1, "view", 2.0)) // one open session for user 1
      q.processAllAvailable()
      assert(spark.table("sessionize_test").isEmpty) // still open: nothing emitted
      input.addData(Event(3, ts(30), 2, "click", 0.5)) // watermark passes the gap
      q.processAllAvailable()
      input.addData(Event(4, ts(59), 3, "click", 0.0)) // one more advance to fire timeout
      q.processAllAvailable()
      val rows = spark.table("sessionize_test")
        .select("user_id", "n_events", "total_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)), rows.toString)
    } finally q.stop()
  }

  test("same transform works on a batch frame (backfill path)") {
    import spark.implicits._
    val batch = Seq(
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(2), 1, "click", 2.0),
      Event(3, ts(11), 2, "view", 3.0)).toDF()
    val out = tumblingStats(batch, "10 minutes", "5 minutes")
      .orderBy("window_start").collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 2L && out(0).getDouble(3) == 3.0)
  }

  test("sessionize batch branch equals the streaming result after all timeouts fire") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val gap = 5 * 60 * 1000L
    val data = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(3), 1, "view", 2.0),   // same session (3 min gap)
      Event(3, ts(20), 1, "click", 4.0), // new session (17 min gap)
      Event(4, ts(2), 2, "view", 0.5))
    // batch path: the window-function branch
    val batch = sessionize(data.toDS(), gap).collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet
    // streaming path: feed the same rows, then advance far enough that every
    // session's event-time timeout fires
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gap).writeStream.format("memory")
      .queryName("sessionize_parity").outputMode("append").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData(Event(99, ts(300), 9, "click", 0.0)) // watermark sweep
      q.processAllAvailable()
      input.addData(Event(100, ts(600), 9, "click", 0.0)) // close user 9's first too
      q.processAllAvailable()
      val streamed = spark.table("sessionize_parity").as[SessionSummary].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value))
        .filter(_._1 != 9L).toSet // the sweep user's sessions are scaffolding
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(batch.size == 3)
    } finally q.stop()
  }

  test("enrichWithDim decorates a live stream with a static dim; misses survive with nulls") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("cust_id", "tier")
    val input = MemoryStream[Event]
    val out = enrichWithDim(input.toDF(), dim, "user_id", "cust_id", Seq("tier"))
    val q = toMemorySink(out, "enrich_test", complete = false)
    try {
      input.addData(
        Event(1, ts(1), 1, "click", 1.0),
        Event(2, ts(2), 2, "view", 2.0),
        Event(3, ts(3), 9, "click", 3.0)) // user 9 not in the dim
      q.processAllAvailable()
      val rows = spark.table("enrich_test")
        .select("event_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows == Map(1L -> Some("GOLD"), 2L -> Some("SILVER"), 3L -> None), rows)
      // batch face: identical plan, identical answer
      val batch = enrichWithDim(
        Seq(Event(1, ts(1), 1, "click", 1.0), Event(3, ts(3), 9, "click", 3.0)).toDF(),
        dim, "user_id", "cust_id", Seq("tier"))
        .select("event_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(batch == Map(1L -> Some("GOLD"), 3L -> None), batch)
    } finally q.stop()
  }
}
