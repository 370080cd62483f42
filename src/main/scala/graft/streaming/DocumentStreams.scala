package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Streaming ingest for a document corpus — the live-path counterpart of
  * [[graft.operators.TrainingPipeline.curate]] (additive north-star scope;
  * the reference has no streaming surface). Input shape: (doc_id, ts, text)
  * where `ts` is ingest event time.
  *
  * Every transform works identically on a `readStream` frame and a batch
  * frame (backfill path): annotation is pure per-row Column expressions
  * (codegen'd, stateless), dedup and stats carry watermarks so state stays
  * bounded on an unbounded stream. Near-dup removal has no bounded-state
  * streaming form (a near-dup can arrive arbitrarily late); the intended
  * topology is annotate+filter+exact-dedup on the live path, with the
  * LSH near-dup pass running as a periodic batch compaction over the sink —
  * the standard lambda split for training-data ingest.
  */
object DocumentStreams {

  /** Per-row annotation: language, quality score, token counts, fingerprint —
    * stateless map, safe on any stream without a watermark.
    */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val stats = TextFunctions.qualityStats(col(textCol))
    docs
      .withColumn("pred_lang", TextFunctions.langId(col(textCol)))
      .withColumns(stats.map { case (n, c) => n -> c }.toMap)
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
  }

  /** Live curation: annotate, drop low-quality docs, and drop exact
    * duplicates whose fingerprint+length was already seen within the
    * watermark horizon. Dedup state is evicted past the watermark — the
    * property that makes this runnable indefinitely. (fp, n_chars_calc) is
    * the dedup key: 32+8 bytes of state per doc instead of the full text,
    * at a vanishing false-positive rate for the 31-bit rolling hash plus
    * exact length.
    */
  def curateStream(
      docs: DataFrame,
      watermark: String,
      minQuality: Double,
      textCol: String = "text"): DataFrame = {
    val filtered = annotate(docs, textCol).where(col("quality_score") >= minQuality)
    if (docs.isStreaming)
      filtered
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("fp", "n_chars_calc")
    else
      // batch backfill of the same pipeline (Spark rejects
      // dropDuplicatesWithinWatermark on batch frames): the horizon covers
      // the whole bounded input → plain dedup on the same keys
      filtered.dropDuplicates("fp", "n_chars_calc")
  }

  /** Tumbling-window corpus statistics per detected language: doc counts,
    * total/mean document length — the live monitoring aggregate for an
    * ingest pipeline (watch a crawl go bad in minutes, not after the batch
    * job). Windowed + watermarked, so state closes as time advances.
    */
  def corpusStats(docs: DataFrame, windowLen: String, watermark: String,
      textCol: String = "text"): DataFrame =
    annotate(docs, textCol)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars_calc").as("total_chars"),
        avg("quality_score").as("mean_quality"))
      .select(col("w.start").as("window_start"), col("pred_lang"),
        col("n_docs"), col("total_chars"), col("mean_quality"))
}
