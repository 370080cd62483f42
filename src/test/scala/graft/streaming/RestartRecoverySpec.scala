package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.sql.Timestamp

/** Checkpoint-restart e2e for the stateful streaming operators: MemoryStream
  * specs prove semantics within ONE run; these prove the property that makes
  * watermark state trustworthy in production — a query can be STOPPED mid
  * stream and restarted on its checkpoint, and the recovered run (state,
  * watermark, file-source progress, file-sink commit log) produces exactly
  * the output a never-stopped run produces. Any divergence here is a real
  * state-management bug a single-run spec cannot catch: lost/duplicated
  * sink batches, state not recovered, watermark regressing and re-admitting
  * dropped data.
  */
class RestartRecoverySpec extends SparkSpec {
  import EventStreams.Event

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** Run `pipeline` over a parquet file source → parquet file sink twice:
    * SPLIT (batch1 visible, processAllAvailable, STOP the query; add
    * batch2, restart on the same checkpoint, processAllAvailable, stop) and
    * SINGLE (all files visible from the start, fresh checkpoint, one run).
    * Returns (splitRows, singleRows) as canonicalized multisets.
    */
  private def runSplitAndSingle(
      batch1: Seq[Event],
      batch2: Seq[Event],
      pipeline: DataFrame => DataFrame): (Seq[String], Seq[String]) = {
    import spark.implicits._
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema

    def writeFiles(dir: String, events: Seq[Event]): Unit =
      events.toDS().coalesce(1).write.mode("append").parquet(dir)

    def runOnce(src: String, sink: String, ckpt: String): Unit = {
      val in = spark.readStream.schema(schema).parquet(src)
      val q = pipeline(in).writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }

    def readSink(sink: String): Seq[String] =
      spark.read.parquet(sink).collect()
        .map(r => r.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

    val root = java.nio.file.Files.createTempDirectory("graft-restart").toString
    // split: batch1 → stop → batch2 on the SAME checkpoint
    writeFiles(s"$root/src1", batch1)
    runOnce(s"$root/src1", s"$root/sink1", s"$root/ckpt1")
    writeFiles(s"$root/src1", batch2)
    runOnce(s"$root/src1", s"$root/sink1", s"$root/ckpt1")
    // single: everything visible from the start, fresh checkpoint
    writeFiles(s"$root/src2", batch1)
    writeFiles(s"$root/src2", batch2)
    runOnce(s"$root/src2", s"$root/sink2", s"$root/ckpt2")
    (readSink(s"$root/sink1"), readSink(s"$root/sink2"))
  }

  test("dedupWithinWatermark survives restart: recovered state still drops cross-restart dups, no re-emits") {
    val batch1 = Seq(
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(2), 2, "view", 2.0),
      Event(1, ts(3), 1, "click", 1.0)) // in-run dup of key 1: dropped
    val batch2 = Seq(
      Event(2, ts(4), 2, "view", 2.0),  // CROSS-RESTART dup: only recovered state can drop it
      Event(3, ts(5), 3, "click", 3.0),
      Event(4, ts(40), 4, "view", 4.0)) // pushes the watermark
    val (split, single) = runSplitAndSingle(batch1, batch2,
      df => EventStreams.dedupWithinWatermark(df, "30 minutes", "event_id"))
    assert(split == single, s"restart diverged\nsplit:  $split\nsingle: $single")
    // and the semantics are right, not just consistent: 4 unique keys, each once
    assert(split.size == 4)
  }

  test("sessionize survives restart: sessions spanning the stop close identically") {
    // user 1's session STRADDLES the restart (events in both batches within
    // the gap) — closing it correctly requires the flatMapGroupsWithState
    // state AND its event-time timeout to come back from the checkpoint
    val batch1 = Seq(
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(3), 1, "click", 2.0),
      Event(3, ts(2), 2, "view", 5.0))
    val batch2 = Seq(
      Event(4, ts(5), 1, "click", 3.0),  // continues user 1's open session
      Event(5, ts(45), 9, "click", 0.0), // quiet period passes → sessions close
      Event(6, ts(59), 9, "click", 0.0)) // pushes watermark past 45+gap? no — keeps 9 open
    val (split, single) = runSplitAndSingle(batch1, batch2, df => {
      import spark.implicits._
      EventStreams.sessionize(df.as[Event], gapMs = 10 * 60 * 1000L).toDF()
    })
    assert(split == single, s"restart diverged\nsplit:  $split\nsingle: $single")
    // the straddling session closed once, with events from BOTH sides of
    // the restart folded in (3 events, value 6.0)
    assert(split.exists(r => r.startsWith("1|") && r.contains("|3|6.0")),
      s"user 1's cross-restart session wrong: $split")
  }

  test("windowOhlc survives restart: bars whose window spans the stop are identical") {
    // the 10:00 window receives rows in BOTH batches: its open/high/low/
    // close must fold rows from before and after the restart into one bar
    val batch1 = Seq(
      Event(1, ts(1), 1, "trade", 10.0),
      Event(2, ts(3), 1, "trade", 14.0),
      Event(3, ts(2), 2, "quote", 5.0))
    val batch2 = Seq(
      Event(4, ts(6), 1, "trade", 7.0),   // same 10:00–10:10 window, post-restart
      Event(5, ts(9), 1, "trade", 12.0),
      Event(6, ts(50), 1, "trade", 1.0))  // advances watermark → closes the bars
    val (split, single) = runSplitAndSingle(batch1, batch2,
      df => EventStreams.windowOhlc(df, "10 minutes", "5 minutes"))
    assert(split == single, s"restart diverged\nsplit:  $split\nsingle: $single")
    // the straddling trade bar: o=10 (ts 10:01), h=14, l=7, c=12 (ts 10:09), n=4
    assert(split.exists(r => r.contains("trade|10.0|14.0|7.0|12.0|4")),
      s"cross-restart OHLC bar wrong: $split")
  }
}
