package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Doc(doc_id: Long, ts: Timestamp, text: String)

case class SrcDoc(doc_id: Long, ts: Timestamp, text: String, source: String)

class DocumentStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val good = "the quick brown fox jumps over the lazy dog and then the " +
    "other animals watched it in the warm afternoon light of the meadow"
  private val junk = "!!! ??? ,,, 123 456 789 000 111" // punct/digit heavy

  test("curateStream drops low-quality docs and in-horizon exact duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val out = DocumentStreams.curateStream(input.toDF(), "10 minutes", minQuality = 0.2)
    val q = EventStreams.toMemorySink(out, "curate_stream_test", complete = false)
    try {
      input.addData(
        Doc(1, ts(0), good),
        Doc(2, ts(1), good),  // exact dup inside the horizon → dropped
        Doc(3, ts(2), junk),  // below quality cut → dropped
        Doc(4, ts(3), good + " extra tail words here")) // distinct → kept
      q.processAllAvailable()
      val ids = spark.table("curate_stream_test").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 4L), ids)
      // annotation columns ride along
      val cols = spark.table("curate_stream_test").columns.toSet
      assert(Set("pred_lang", "quality_score", "fp").subsetOf(cols), cols)
    } finally q.stop()
  }

  test("curateStream state is bounded: duplicates past the watermark horizon are re-admitted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val out = DocumentStreams.curateStream(input.toDF(), "5 minutes", minQuality = 0.2)
    val q = EventStreams.toMemorySink(out, "curate_horizon_test", complete = false)
    try {
      input.addData(Doc(1, ts(0), good))
      q.processAllAvailable()
      // advance the watermark far past the horizon, then replay the same text:
      // its dedup state was evicted, so the doc is admitted again — the
      // bounded-state contract (the batch near-dup compaction catches it)
      input.addData(Doc(2, ts(50), "unrelated filler text that scores fine " +
        "with plenty of ordinary words in a row to pass the quality bar"))
      q.processAllAvailable()
      input.addData(Doc(3, ts(55), good))
      q.processAllAvailable()
      val ids = spark.table("curate_horizon_test").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 3L), ids)
    } finally q.stop()
  }

  test("corpusStats windows per language with bounded state; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val agg = DocumentStreams.corpusStats(input.toDF(), "10 minutes", "5 minutes")
    val q = EventStreams.toMemorySink(agg, "corpus_stats_test", complete = false)
    try {
      val batch = Seq(
        Doc(1, ts(1), good),
        Doc(2, ts(4), good + " tail"),
        Doc(3, ts(12), good))
      input.addData(batch: _*)
      q.processAllAvailable()
      input.addData(Doc(9, ts(45), good)) // advance watermark, close windows
      q.processAllAvailable()
      val rows = spark.table("corpus_stats_test")
        .select("window_start", "pred_lang", "n_docs").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "en", 2L)), rows)
      assert(rows.contains(("2024-01-01 10:10:00.0", "en", 1L)), rows)
      // the same transform runs on a batch frame (backfill path) and agrees
      // with the streamed result for the windows the batch saw
      val batchOut = DocumentStreams.corpusStats(batch.toDF(), "10 minutes", "5 minutes")
        .select("window_start", "pred_lang", "n_docs").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(batchOut == Set(
        ("2024-01-01 10:00:00.0", "en", 2L),
        ("2024-01-01 10:10:00.0", "en", 1L)), batchOut)
    } finally q.stop()
  }

  test("windowTokenCounts + topTokensPerWindow: closed windows rank live, batch face agrees") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Doc]
    val counts = DocumentStreams.windowTokenCounts(input.toDF(), "10 minutes", "5 minutes")
    val q = EventStreams.toMemorySink(counts, "win_tok_test", complete = false)
    try {
      val batch = Seq(
        Doc(1, ts(1), "alpha alpha beta"),
        Doc(2, ts(4), "alpha gamma"),
        Doc(3, ts(12), "beta beta"))
      input.addData(batch: _*)
      q.processAllAvailable()
      input.addData(Doc(9, ts(45), "closer")) // advance watermark, close both windows
      q.processAllAvailable()
      // rank over the append output — the foreachBatch stage, run as batch here
      val ranked = DocumentStreams.topTokensPerWindow(spark.table("win_tok_test"), 2)
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getInt(3)))
        .toSet
      assert(ranked.contains(("2024-01-01 10:00:00.0", "alpha", 3L, 1)), ranked)
      assert(ranked.contains(("2024-01-01 10:00:00.0", "beta", 1L, 2)), ranked)
      assert(ranked.contains(("2024-01-01 10:10:00.0", "beta", 2L, 1)), ranked)
      // k=2 cut: gamma (count 1, after beta alphabetically) never ranks
      assert(!ranked.exists(_._2 == "gamma"), ranked)
      // batch face: same two functions composed directly over the same rows
      val direct = DocumentStreams.topTokensPerWindow(
        DocumentStreams.windowTokenCounts(batch.toDF(), "10 minutes", "5 minutes"), 2)
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getInt(3)))
        .toSet
      assert(direct == ranked.filter(_._1 != "2024-01-01 10:40:00.0"), direct)
    } finally q.stop()
  }

  test("mixture drift: shares per closed window, tolerance verdicts, unexpected-source alert; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SrcDoc]
    val counts = DocumentStreams.windowSourceTokens(input.toDF(), "10 minutes", "5 minutes")
    val q = EventStreams.toMemorySink(counts, "mix_drift_test", complete = false)
    try {
      // window 10:00: web 6 toks of 10 (0.6, target 0.5, dev 0.1 > 0.05 → drift),
      // books 4 of 10 (0.4, target 0.5 ⇒ wait: target books 0.4 → dev 0 → ok)
      val batch = Seq(
        SrcDoc(1, ts(1), "w1 w2 w3 w4 w5 w6", "web"),
        SrcDoc(2, ts(4), "b1 b2 b3 b4", "books"),
        SrcDoc(3, ts(12), "w1 w2", "web"),
        SrcDoc(4, ts(13), "x1 x2", "surprise"))
      input.addData(batch: _*)
      q.processAllAvailable()
      input.addData(SrcDoc(9, ts(45), "closer", "web")) // close both windows
      q.processAllAvailable()
      val drift = DocumentStreams.mixtureDrift(
        spark.table("mix_drift_test"), Seq("web" -> 0.5, "books" -> 0.4), tolerance = 0.05)
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getDouble(4), r.getBoolean(7))).toSet
      // 10:00 window: web 6/10 = 0.6 (dev 0.1 → drifted), books 0.4 (dev 0.0 → ok)
      assert(drift.contains(("2024-01-01 10:00:00.0", "web", 0.6, true)), drift)
      assert(drift.contains(("2024-01-01 10:00:00.0", "books", 0.4, false)), drift)
      // 10:10 window: web 0.5 (ok), surprise 0.5 (no target → alert)
      assert(drift.contains(("2024-01-01 10:10:00.0", "web", 0.5, false)), drift)
      assert(drift.contains(("2024-01-01 10:10:00.0", "surprise", 0.5, true)), drift)
      // batch face: identical composition over the same rows
      val direct = DocumentStreams.mixtureDrift(
        DocumentStreams.windowSourceTokens(batch.toDF(), "10 minutes", "5 minutes"),
        Seq("web" -> 0.5, "books" -> 0.4), tolerance = 0.05)
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getDouble(4), r.getBoolean(7))).toSet
      assert(direct == drift.filter(!_._1.startsWith("2024-01-01 10:40")), direct)
      intercept[IllegalArgumentException](
        DocumentStreams.mixtureDrift(batch.toDF(), Seq.empty, 0.05))
    } finally q.stop()
  }

  test("nearDupPairsStream: in-horizon near-dups detected once, out-of-horizon ignored") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // base and nearDup differ in one edge word over 30 words: 3-gram
    // Jaccard 27/29 >= 0.5; `far` repeats base past the horizon
    val words = (1 to 30).map(i => s"tok$i")
    val base = words.mkString(" ")
    val near = ("zzz" +: words.tail).mkString(" ")
    val other = (1 to 30).map(i => s"other$i").mkString(" ")
    val input = MemoryStream[Doc]
    val out = DocumentStreams.nearDupPairsStream(
      input.toDF(), watermark = "5 minutes", horizon = "10 minutes", threshold = 0.5)
    val q = EventStreams.toMemorySink(out, "neardup_stream_test", complete = false)
    try {
      input.addData(
        Doc(1, ts(0), base),
        Doc(2, ts(3), near),   // in-horizon near-dup of 1 → pair (1,2)
        Doc(3, ts(4), other))  // unrelated → no pair
      q.processAllAvailable()
      input.addData(Doc(4, ts(45), base)) // same text, 45 min later: outside
      q.processAllAvailable()              // the 10-min horizon → NO pair
      input.addData(Doc(5, ts(59), good)) // advance watermark past doc 4
      q.processAllAvailable()
      val got = spark.table("neardup_stream_test")
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      // exactly-once: the (1,2) pair agrees in MANY bands (27 shared
      // shingles) but must emit a single row
      assert(got.toSeq == Seq((1L, 2L)), got.toSeq)
      // the batch face on the same rows produces the same pair set
      val batchDf = Seq(
        Doc(1, ts(0), base), Doc(2, ts(3), near), Doc(3, ts(4), other),
        Doc(4, ts(45), base), Doc(5, ts(59), good)).toDF()
      val batch = DocumentStreams.nearDupPairsStream(
        batchDf, watermark = "5 minutes", horizon = "10 minutes", threshold = 0.5)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(batch.toSeq.sorted == Seq((1L, 2L)), batch.toSeq)
    } finally q.stop()
  }

  test("firstAgreeingBand kernel = the interpreted filter/slice formulation on random signatures") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = 2
    val bands = 8
    // force agreements: copy whole bands from a into b at random positions
    val data = (0 until 200).map { i =>
      val a = Array.fill(bands * rows)(rnd.nextLong())
      val b = Array.fill(bands * rows)(rnd.nextLong())
      (0 until bands).foreach { bd =>
        if (rnd.nextInt(10) < 3) System.arraycopy(a, bd * rows, b, bd * rows, rows)
      }
      (i.toLong, a.toSeq, b.toSeq)
    }.toDF("id", "siga", "sigb")
    val hof = try_element_at(
      filter(sequence(lit(0), lit(bands - 1)), bd =>
        slice(col("siga"), bd * lit(rows) + lit(1), lit(rows)) ===
          slice(col("sigb"), bd * lit(rows) + lit(1), lit(rows))), lit(1))
    val out = data.select(
      graft.functions.ShingleFunctions.firstAgreeingBand(col("siga"), col("sigb"), rows).as("k"),
      coalesce(hof, lit(-1)).as("h")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    assert(out.exists(_.getInt(0) >= 0) && out.exists(_.getInt(0) == -1))
  }
}

/** The full operational dedup loop as a STREAM (st-face of d34/d35): each
  * micro-batch dedups against the persisted index; admitted survivors are
  * appended to the index so later batches dedup against earlier ones.
  */
class IncrementalDedupStreamSpec extends SparkSpec {
  import graft.operators.Dedup

  test("micro-batches dedup against the index AND each other; equals the batch staged run") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val base = docs.where(col("doc_id") % 4 =!= 0)
    val w1 = docs.where(col("doc_id") % 8 === 0) // first arriving increment
    val w2 = docs.where(col("doc_id") % 8 === 4) // second increment
    Dedup.writeMinhashIndex(spark, base, "doc_id", "text", "graft_stream_idx", buckets = 4)

    val tmp = java.nio.file.Files.createTempDirectory("graft-incstream").toString
    val input = MemoryStream[(Long, String)]
    val q = DocumentStreams.incrementalDedupStream(
      input.toDF().toDF("doc_id", "text"),
      "graft_stream_idx", s"$tmp/sink", s"$tmp/ckpt",
      admitToIndex = true, buckets = 4)
    try {
      input.addData(w1.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      input.addData(w2.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$tmp/sink")
      .select("doc_id").as[Long].collect().toSet

    // batch reference: stage the same two waves through a fresh index
    Dedup.writeMinhashIndex(spark, base, "doc_id", "text", "graft_stream_ref", buckets = 4)
    val s1 = Dedup.incrementalDedupMd5(spark, w1, "doc_id", "text", "graft_stream_ref")
      .localCheckpoint(true)
    Dedup.appendMinhashIndex(spark, s1, "doc_id", "text", "graft_stream_ref", buckets = 4)
    val s2 = Dedup.incrementalDedupMd5(spark, w2, "doc_id", "text", "graft_stream_ref")
    val expected = (s1.select("doc_id").as[Long].collect() ++
      s2.select("doc_id").as[Long].collect()).toSet
    assert(streamed == expected,
      s"stream/batch diverged: only-stream=${streamed -- expected}, only-batch=${expected -- streamed}")
    assert(streamed.nonEmpty && streamed.forall(_ % 4 == 0))
  }

  test("sink is idempotent under foreachBatch re-delivery (same batchId re-run)") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    Dedup.writeMinhashIndex(spark, docs.where(col("doc_id") % 4 =!= 0),
      "doc_id", "text", "graft_redeliver_idx", buckets = 4)
    val tmp = java.nio.file.Files.createTempDirectory("graft-redeliver").toString
    val batch = docs.where(col("doc_id") % 8 === 0)
    def runBody(): Unit = DocumentStreams.dedupBatchBody(
      batch, batchId = 7L, "graft_redeliver_idx", s"$tmp/sink", admitToIndex = false,
      "doc_id", "text", 3, 64, 32, 0.5, 4)
    runBody()
    val first = spark.read.parquet(s"$tmp/sink").select("doc_id").as[Long].collect().sorted.toSeq
    runBody() // crash re-delivery: same batchId again
    val second = spark.read.parquet(s"$tmp/sink").select("doc_id").as[Long].collect().sorted.toSeq
    assert(first.nonEmpty && second == first,
      s"re-delivered batch changed the sink: ${first.size} -> ${second.size} rows")
  }

  test("sink idempotent under re-delivery WITH admitToIndex (post-append crash window)") {
    // the hard crash window: appendMinhashIndex committed, streaming
    // checkpoint did not — re-delivery probes an index that already holds
    // this batch's own survivors. Without the delta-id exclusion every
    // shingled survivor self-matches (Jaccard 1.0) and the dynamic
    // partition overwrite would rewrite the partition with ONLY the
    // sub-shingle-length docs (which never enter the index) — silent loss.
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    Dedup.writeMinhashIndex(spark, docs.where(col("doc_id") % 4 =!= 0),
      "doc_id", "text", "graft_redeliver_adm_idx", buckets = 4)
    val tmp = java.nio.file.Files.createTempDirectory("graft-redeliver-adm").toString
    // mixed batch: long docs (shingled, index-admitted) + docs shorter than
    // shingleSize words (always survive, never shingled)
    val batch = docs.where(col("doc_id") % 8 === 0)
      .union(Seq((900001L, "tiny"), (900002L, "two words")).toDF("doc_id", "text"))
    def runBody(): Unit = DocumentStreams.dedupBatchBody(
      batch, batchId = 9L, "graft_redeliver_adm_idx", s"$tmp/sink", admitToIndex = true,
      "doc_id", "text", 3, 64, 32, 0.5, 4)
    runBody()
    val first = spark.read.parquet(s"$tmp/sink").select("doc_id").as[Long].collect().sorted.toSeq
    assert(first.exists(_ < 900000L) && first.contains(900001L),
      s"batch must admit both long and short docs, got $first")
    runBody() // crash re-delivery: index already contains this batch's rows
    val second = spark.read.parquet(s"$tmp/sink").select("doc_id").as[Long].collect().sorted.toSeq
    assert(second == first,
      s"re-delivered admitToIndex batch changed the sink: only-first=${first.toSet -- second.toSet}, only-second=${second.toSet -- first.toSet}")
  }
}
