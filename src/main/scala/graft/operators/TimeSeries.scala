package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series utilities over event frames — reporting-side primitives that
  * complement the as-of/range join family.
  */
object TimeSeries {

  /** Dense time-spine gap-fill: one output row per (group, bucket) for
    * EVERY bucket between the frame's min and max bucket, zero-filled where
    * no events landed — the "no silent gaps in the report" primitive that a
    * plain groupBy can't provide (absent buckets simply don't exist there).
    *
    * Scale shape: the observed counts are one aggregation; the spine is
    * built from a 1-row min/max bounds frame exploded map-side and
    * cross-joined with the distinct group set — both broadcast-tiny, the
    * spine is OUTPUT-sized (|groups| × |buckets|), never input-sized; the
    * final left join probes the counts with the spine broadcast. At 100 TB
    * the only full pass is the count aggregation itself.
    *
    * Returns `(bucket_start timestamp, <groupCol>, n)` with n = 0 for empty
    * buckets.
    */
  def gapFillCounts(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "gapFillCounts: bucketSeconds must be positive")
    val ev = df.select(col(groupCol).as("g"),
      ((unix_timestamp(col(tsCol).cast("timestamp")) / bucketSeconds).cast("long") *
        bucketSeconds).as("b"))
    val counts = ev.groupBy("g", "b").agg(count(lit(1)).as("n"))
    val bounds = ev.agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), lit(bucketSeconds))).as("b"))
    val groups = ev.select(col("g")).distinct()
    broadcast(spine).crossJoin(broadcast(groups))
      .join(counts, Seq("g", "b"), "left_outer")
      .select(col("b").cast("timestamp").as("bucket_start"), col("g").as(groupCol),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
