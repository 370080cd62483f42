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

  /** OHLC bars (the resample-to-bars primitive): per (group, bucket) the
    * Open/High/Low/Close of `valCol`, plus the observation count. Open and
    * close are defined on the UNIQUE ordering (ts, tiebreakCol) — two
    * observations in the same microsecond still pick deterministically, so
    * the bars are bit-stable across engines and retries (the repo-wide
    * unique-sort-tiebreak rule applied to arg-min/arg-max).
    *
    * Scale shape: ONE map-side-combined aggregation — min_by/max_by/min/
    * max/count all merge associatively, so the shuffle carries one narrow
    * row per (group, bucket), never raw observations.
    */
  def ohlcBars(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      valCol: String,
      tiebreakCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "ohlcBars: bucketSeconds must be positive")
    val ev = df.select(col(groupCol).as("g"),
      ((unix_timestamp(col(tsCol).cast("timestamp")) / bucketSeconds).cast("long") *
        bucketSeconds).as("b"),
      col(tsCol).as("t"), col(tiebreakCol).as("tb"), col(valCol).cast("double").as("v"))
    ev.groupBy("g", "b")
      .agg(
        min_by(col("v"), struct(col("t"), col("tb"))).as("o"),
        max(col("v")).as("h"),
        min(col("v")).as("l"),
        max_by(col("v"), struct(col("t"), col("tb"))).as("c"),
        count(lit(1)).as("n"))
      .select(col("g").as(groupCol), col("b").cast("timestamp").as("bucket_start"),
        col("o"), col("h"), col("l"), col("c"), col("n"))
  }

  /** TWAP — time-weighted average per (group, bucket): each observation's
    * value holds from its timestamp until the next observation in the
    * bucket (the last holds to bucket end), so irregular sampling doesn't
    * bias the mean toward burst periods the way a plain AVG does — the
    * standard fairness fix for market/metric data. Durations are integer
    * microseconds (exact); ties on ts order by `tiebreakCol`, making the
    * zero-duration assignment deterministic. The value·duration sum is an
    * ORDERED fold over the (ts, tiebreak)-sorted observation list — the
    * repo's cross-engine float rule — and the denominator is an integer
    * SUM, so the quotient is bit-identical everywhere.
    *
    * Scale shape: one window (lead) over the (g, b) partitioning, one
    * aggregation; the fold list is bucket-local (bounded by per-bucket
    * observation count), never corpus-wide.
    */
  def twap(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      valCol: String,
      tiebreakCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "twap: bucketSeconds must be positive")
    import org.apache.spark.sql.expressions.Window
    val usPerBucket = bucketSeconds * 1000000L
    val ev = df.select(col(groupCol).as("g"),
      ((unix_micros(col(tsCol).cast("timestamp")) / usPerBucket).cast("long") *
        usPerBucket).as("b"),
      unix_micros(col(tsCol).cast("timestamp")).as("t_us"),
      col(tiebreakCol).as("tb"), col(valCol).cast("double").as("v"))
    val w = Window.partitionBy("g", "b").orderBy(col("t_us"), col("tb"))
    val withDur = ev.withColumn("dur",
      coalesce(lead(col("t_us"), 1).over(w), col("b") + lit(usPerBucket)) - col("t_us"))
    withDur.groupBy("g", "b")
      .agg(
        round(
          aggregate(
            array_sort(collect_list(struct(col("t_us"), col("tb"),
              (col("v") * col("dur").cast("double")).as("vd")))),
            lit(0.0), (acc, x) => acc + x.getField("vd")) /
            sum(col("dur")).cast("double"),
          6).as("twap"),
        count(lit(1)).as("n"))
      .select(col("g").as(groupCol), timestamp_micros(col("b")).as("bucket_start"),
        col("twap"), col("n"))
  }

  /** Linear time-weighted interpolation onto a dense per-group bucket
    * spine: buckets with an observation keep it (bucket value = max of the
    * bucket's values — an exact, order-independent pick); empty interior
    * buckets take `prev + (next − prev) · (t − t_prev)/(t_next − t_prev)`
    * between the nearest observed neighbors — the standard gap-repair
    * primitive for sensor/metric series before feature extraction
    * ([[gapFillCounts]] fills counts with zeros; this fills VALUES by
    * interpolation).
    *
    * Scale shape: one aggregation builds the observed frame; the per-group
    * spine is OUTPUT-sized (built from each group's min/max bucket,
    * exploded map-side); prev/next neighbors come from two
    * last/first-ignore-nulls passes over ONE window partitioning (single
    * exchange + sort, no self-join probe). Per-group spines mean no
    * global-range blowup when group lifetimes differ by orders of
    * magnitude.
    *
    * Returns `(<groupCol>, bucket_start timestamp, v, observed)`; spine
    * edges are observed buckets by construction, so `v` is never null.
    */
  def interpolateLinear(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      valCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "interpolateLinear: bucketSeconds must be positive")
    import org.apache.spark.sql.expressions.Window
    val ev = df.select(col(groupCol).as("g"),
      ((unix_timestamp(col(tsCol).cast("timestamp")) / bucketSeconds).cast("long") *
        bucketSeconds).as("b"),
      col(valCol).cast("double").as("v"))
    val obs = ev.groupBy("g", "b").agg(max(col("v")).as("v"))
    val spine = obs.groupBy("g").agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
      .select(col("g"), explode(sequence(col("lo"), col("hi"), lit(bucketSeconds))).as("b"))
    val wPrev = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(obs, Seq("g", "b"), "left_outer")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pb", last(when(col("v").isNotNull, col("b")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nb", first(when(col("v").isNotNull, col("b")), ignoreNulls = true).over(wNext))
      .select(col("g").as(groupCol), col("b").cast("timestamp").as("bucket_start"),
        round(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("b") - col("pb")).cast("double") / (col("nb") - col("pb")))),
          6).as("v"),
        col("v").isNotNull.as("observed"))
  }

  /** Truncated EWMA — per group, ordered by the unique (ts, tiebreak) key,
    * the exponentially weighted moving average over the trailing `lookback`
    * observations: `e = fold(x_{n-K+1..n}, e ← e·(1−α) + x·α)` seeded with
    * the oldest value in the frame. EWMA's recurrence is NOT associative,
    * so a running window aggregate can't state it; truncating at `lookback`
    * makes it a bounded ordered fold instead (the dropped tail carries
    * weight (1−α)^K — 2⁻³² at the defaults, far below the 6-decimal output
    * grid), which is what keeps it exact, scale-safe AND cross-engine
    * bit-stable: both engines fold the identical doubles in the identical
    * order, and IEEE ±·· are correctly rounded everywhere.
    *
    * Scale shape: one hash exchange on the group key, one sort, and a
    * bounded K-element frame buffer per row — no unbounded per-group state,
    * no rescaled-cumulative-sum trick (whose (1−α)^{−i} factors overflow
    * doubles after ~1k rows).
    *
    * Returns the input key columns plus `value` and `ewma` (on the
    * [[Fp.grid6]] 6-decimal output grid).
    */
  def ewma(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      valCol: String,
      tiebreakCol: String,
      alpha: Double = 0.5,
      lookback: Int = 32): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"ewma: alpha must be in (0, 1], got $alpha")
    require(lookback >= 1, s"ewma: lookback must be >= 1, got $lookback")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("t"), col("tb"))
      .rowsBetween(-(lookback - 1), Window.currentRow)
    df.select(col(groupCol).as("g"), col(tsCol).as("t"), col(tiebreakCol).as("tb"),
        col(valCol).cast("double").as("v"))
      // collect_list drops NULLs (DuckDB array_agg keeps them) — dropping
      // the rows up front keeps the frame arrays identical cross-engine.
      .where(col("v").isNotNull)
      .withColumn("arr", collect_list(col("v")).over(w))
      .select(col("g").as(groupCol), col("t").as(tsCol), col("tb").as(tiebreakCol),
        col("v").as("value"),
        // Codegen fold kernel (r18): replaces the interpreted
        // `aggregate(slice(arr,2,lookback), arr[0], acc*(1-α)+x*α)` HOF
        // with the bit-identical IEEE sequence inside whole-stage codegen
        // (EwmaFold scaladoc has the equivalence argument; EwmaFoldSpec
        // pins it against the old expression on random frames). Fp.grid6 —
        // not round() — so the 6-decimal grid point is the identical
        // double in both engines.
        Fp.grid6(graft.functions.EwmaFold.ewmaFold(col("arr"), alpha, lookback))
          .as("ewma"))
  }

  /** Rolling z-score anomaly detection — per group, ordered by the unique
    * (ts, tiebreak) key, each observation is scored against the mean and
    * population variance of the PRECEDING `lookback` observations (current
    * row excluded — the score is out-of-sample); rows with `|z| > threshold`
    * and a warm history (`n ≥ minObs`) are flagged. Mean and variance come
    * from sliding-window SUM/COUNT aggregates whose in-frame-order adds are
    * bit-identical to the ordered left-folds the oracle states (see the
    * inline note), so both engines add the identical doubles in the
    * identical order — with IEEE-exact ±·/·sqrt that makes z bit-stable,
    * and the threshold comparison with it.
    *
    * Scale shape: one hash exchange on the group key, one sort, bounded
    * K-element frame buffer per row; the anomaly filter is map-side after
    * the window.
    *
    * Returns flagged rows: key columns, `value`, `mu`, `sigma`, `z`
    * (mu/sigma/z rounded 6).
    */
  def rollingZscore(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      valCol: String,
      tiebreakCol: String,
      lookback: Int = 64,
      minObs: Int = 16,
      threshold: Double = 3.0): DataFrame = {
    require(lookback >= minObs && minObs >= 2,
      s"rollingZscore: need lookback >= minObs >= 2, got lookback=$lookback minObs=$minObs")
    require(threshold > 0.0, s"rollingZscore: threshold must be positive, got $threshold")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("t"), col("tb"))
      .rowsBetween(-lookback, -1)
    // Plain sliding-window SUM/COUNT aggregates instead of the earlier
    // collect_list array + interpreted left-folds (optimization round 17):
    // Spark re-evaluates a sliding frame's Sum by adding the frame's values
    // IN FRAME ORDER from a 0.0-initialized buffer, and 0.0 + x == x
    // bit-exactly for every non-(-0.0) double, so sum(v) over the frame is
    // the SAME IEEE add sequence as the fold seeded with the frame's first
    // element (DuckDB list_reduce) — identical bits, without materializing
    // a lookback-sized array copy + two lambda folds per row. (-0.0 cannot
    // change any OUTPUT here: a frame summing to ±0.0 yields sigma == 0,
    // which the sigma > 0 filter drops either way.) The empty-frame NULL
    // seed the old `get(arr, 0)` provided is now Sum's own NULL-on-empty.
    val n = count(col("v")).over(w).cast("double")
    val sum1 = sum(col("v")).over(w)
    val sum2 = sum(col("v") * col("v")).over(w)
    df.select(col(groupCol).as("g"), col(tsCol).as("t"), col(tiebreakCol).as("tb"),
        col(valCol).cast("double").as("v"))
      // NULL rows dropped up front (DuckDB array_agg kept them in the old
      // array formulation; the frame contents stay identical cross-engine).
      .where(col("v").isNotNull)
      // all three frame aggregates BEFORE the warm-up filter, in ONE select
      // (a window evaluated after the filter would see pruned frames; one
      // projection keeps Catalyst extracting a single Window exec — the
      // withColumn chain split them into two)
      .select(col("*"), n.as("__n"), sum1.as("__s1"), sum2.as("__s2"))
      .where(col("__n") >= minObs)
      .withColumn("mu", col("__s1") / col("__n"))
      .withColumn("sigma", sqrt(col("__s2") / col("__n") - col("mu") * col("mu")))
      .withColumn("z", (col("v") - col("mu")) / col("sigma"))
      .where(col("sigma") > 0.0 && abs(col("z")) > threshold)
      .select(col("g").as(groupCol), col("t").as(tsCol), col("tb").as(tiebreakCol),
        col("v").as("value"), Fp.grid6(col("mu")).as("mu"),
        Fp.grid6(col("sigma")).as("sigma"), Fp.grid6(col("z")).as("z"))
  }

  /** One-sided CUSUM change detection (Page 1954) per group — the
    * level-shift detector rolling z-scores miss (a small persistent drift
    * never trips a per-point threshold; its cumulative sum does).
    *
    * The textbook recursion `S_t = max(0, S_{t−1} + (x_t − μ − slack))`
    * is NOT a Spark window aggregate, but it has a closed form that is:
    * with `RS_t = Σ_{i≤t} d_i` (running sum of deviations),
    * `S_t = RS_t − min(0, min_{j≤t} RS_j)` — a running sum minus a
    * running min, two plain window passes over ONE per-group sort.
    *
    * Cross-engine exactness: doubles summed in window order can never
    * hash-match another engine, so everything runs on an INTEGER grid —
    * and the per-group mean μ = Σx/n is kept exact by scaling the whole
    * inequality by n: `d'_i = n·x'_i − Σx' − n·slack'` (primes = 1e-6
    * grid BIGINTs), flag when `S'_t > n·h'`. Same trick as the d42
    * centroids: the only formulation of a mean-centered statistic two
    * engines hash identically.
    *
    * Scale shape: one output-sized per-group aggregate broadcast back
    * (the a19 baseline pattern), then ONE hash exchange + sort for the
    * two windows. Bound check: |d'| ≤ n·max|x'|, so S' stays under 2⁶³
    * while n·max|x'| < 9.2e18/n — at 1e6-row groups of |x| ≤ 1e6 that
    * holds with 10× margin; larger groups should coarsen the grid.
    */
  def cusumChangepoints(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      valCol: String,
      tiebreakCol: String,
      slack: Double,
      threshold: Double): DataFrame = {
    require(threshold > 0.0, s"cusumChangepoints: threshold must be positive, got $threshold")
    import org.apache.spark.sql.expressions.Window
    // grid6 discipline (Fp): floor(x·1e6 + 0.5) is IEEE-exact and already
    // integral, so the BIGINT cast cannot hit the truncate-vs-half-even
    // engine seam a bare (x*1e6)::BIGINT would
    val micro = (x: org.apache.spark.sql.Column) =>
      floor(x * lit(1000000.0) + lit(0.5)).cast("bigint")
    val base = df.select(col(groupCol).as("g"), col(tsCol).as("t"),
        col(tiebreakCol).as("tb"), micro(col(valCol)).as("x"))
      .where(col("x").isNotNull)
    val stats = base.groupBy("g").agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val w = Window.partitionBy("g").orderBy(col("t"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(stats), Seq("g"))
      .withColumn("d", col("n") * col("x") - col("sx") - col("n") * micro(lit(slack)))
      .withColumn("rs", sum("d").over(w))
      .withColumn("s", col("rs") - least(lit(0L), min("rs").over(w)))
      .withColumn("is_change", col("s") > col("n") * micro(lit(threshold)))
      .select(col("g").as(groupCol), col("t").as(tsCol), col("tb").as(tiebreakCol),
        col("s").as("cusum_scaled"), col("is_change"))
  }

  /** Robust per-group outliers via median/MAD — the resistant alternative
    * to the z-score family (a15): one extreme point inflates a mean AND
    * its stddev, masking itself; the median and the median absolute
    * deviation move by at most one order statistic, so the flag
    * `|x − med| > k·MAD` survives up to 50% contamination (Hampel's
    * classic identifier).
    *
    * Cross-engine exactness: interpolated medians of raw doubles are a
    * hash seam (engines state the midpoint as `(a+b)/2` vs `a+(b−a)/2` —
    * different IEEE roundings), so both medians run on the 1e-6 integer
    * grid: midpoints of integers (and of the .5-grid absolute deviations)
    * are exactly representable, making every downstream op (−, abs, ·3,
    * >, /1e6) bit-identical in any IEEE engine. The d42/a20 trick, two
    * grids deep.
    *
    * Scale shape: two narrow per-group aggregates (group count–sized)
    * broadcast back onto the frame — two full passes, zero wide shuffles
    * of the data itself; exact percentile state is per-group value-count
    * sized, bounded here by the 1e-6 grid's distinct-value cap. Returns
    * only the flagged rows: (idCol, groupCol, valueCol, med, mad, score6)
    * with score6 = |x−med|/MAD on the output grid.
    */
  def robustOutliers(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      valueCol: String,
      k: Double): DataFrame = {
    require(k > 0.0, s"robustOutliers: k must be positive, got $k")
    val micro = (x: org.apache.spark.sql.Column) =>
      floor(x * lit(1000000.0) + lit(0.5)).cast("bigint")
    val base = df.select(col(idCol), col(groupCol).as("g"), col(valueCol))
      .withColumn("__vs", micro(col(valueCol)))
      .where(col("__vs").isNotNull)
    val med = base.groupBy("g")
      .agg(expr("percentile(__vs, 0.5d)").as("__med")) // exact; integer operands
    val dev = base.join(broadcast(med), Seq("g"))
      .withColumn("__ad", abs(col("__vs") - col("__med"))) // .5-grid, exact
    val mad = dev.groupBy("g")
      .agg(expr("percentile(__ad, 0.5d)").as("__mad")) // .25-grid, exact
    dev.join(broadcast(mad), Seq("g"))
      .where(col("__ad") > lit(k) * col("__mad"))
      .select(col(idCol), col("g").as(groupCol), col(valueCol),
        (col("__med") / lit(1000000.0)).as("med"),
        (col("__mad") / lit(1000000.0)).as("mad"),
        // guard the all-identical group (MAD 0): every deviating point is
        // flagged; its score reports as NULL rather than ±Inf
        when(col("__mad") === lit(0.0), lit(null).cast("double"))
          .otherwise(Fp.grid6(col("__ad") / col("__mad"))).as("score6"))
  }

  /** M4 downsampling (Jugel et al., VLDB 2014): per (group, time bucket)
    * keep the four extreme points — first/last by time, min/max by value —
    * the smallest point set that renders a pixel-exact line chart of the
    * full series. The standard first cut for "plot a year of 100 TB of
    * ticks": output is bucket-count sized, error-free for min/max
    * envelopes.
    *
    * Scale shape: ONE aggregate with map-side partial combine and a single
    * exchange on (group, bucket); no window. First/last tie-break on
    * (ts, tiebreak) via struct-ordered min_by/max_by, so duplicate
    * timestamps cannot make the answer run-dependent — and that composite
    * ordering key is the one deliberate trade: Spark's hash aggregate
    * cannot hold a struct ordering buffer (probed: min_by(v, BIGINT) hash-
    * aggregates, min_by(v, struct) does not), so the plan is a
    * SortAggregate — each input partition sorts by the grouping key, still
    * collapsing to bucket-count rows before the shuffle. The alternatives
    * are worse at 100 TB: a scalar-packed key overflows/collides for
    * general (ts, tiebreak), and a two-pass broadcast-back argmin reads
    * the full series twice. On time-partitioned layouts the partial sort
    * is near-free (data arrives bucket-clustered). Values pass through
    * untouched (no float arithmetic at all — exact in any engine).
    */
  /** STL-lite seasonal decomposition per group over hourly buckets:
    * `value ≈ trend + seasonal + resid` with trend = centered 24-bucket
    * moving average of the hourly means and seasonal = per-hour-of-day
    * mean of the detrended series (the classical additive decomposition;
    * one robustness iteration short of full STL, which needs loess).
    *
    * Cross-engine exactness, layer by layer: hourly means are exact
    * DECIMAL sums / exact counts (the a19 discipline); the trend is an
    * ORDERED left-fold over the window's collected array (the a14/a15
    * device — both engines add identical doubles in identical order);
    * the seasonal means snap the detrended values to the 1e-6 grid first
    * so the per-phase aggregate is a SUM OF BIGINTS (order-independent),
    * divided back out with the same two divisions on both sides.
    *
    * Scale shape: ONE full-data pass (the hourly aggregate, map-side
    * combinable); everything after runs on the bucket-count-sized frame —
    * the trend window, the phase aggregate and its broadcast-back join
    * are all OUTPUT-sized. At 100 TB the series grows in rows per bucket,
    * not buckets, so the decomposition cost is constant past the first
    * aggregate.
    */
  def seasonalDecompose(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol).as("g"), date_trunc("hour", col(tsCol)).as("b"))
      .agg(count(lit(1)).as("n"),
        expr(s"cast(sum(cast($valCol as decimal(18,2))) as double)").as("sv"))
      .withColumn("m", col("sv") / col("n"))
    val w = Window.partitionBy("g").orderBy("b").rowsBetween(-11, 12)
    // window SUM/COUNT instead of collect_list + interpreted fold: Spark's
    // sliding Sum adds the frame's values in frame order from a
    // 0.0-initialized buffer — the IDENTICAL IEEE add sequence as the
    // 0.0-seeded fold this replaces, with no per-row array copy (r17)
    val tr = hourly
      .withColumn("trend", sum(col("m")).over(w) / count(col("m")).over(w))
      .withColumn("dtr", col("m") - col("trend"))
      .withColumn("ds",
        floor((col("m") - col("trend")) * lit(1000000.0) + lit(0.5)).cast("bigint"))
      .withColumn("ph", hour(col("b")))
    val seas = tr.groupBy("g", "ph")
      .agg(sum("ds").as("ss"), count(lit(1)).as("np"))
    tr.join(broadcast(seas), Seq("g", "ph"))
      .withColumn("seasonal", col("ss").cast("double") / col("np") / lit(1000000.0))
      .select(col("g").as(groupCol), col("b").as("bucket_start"), col("n"),
        col("m").as("hourly_mean"), col("trend"), col("seasonal"),
        (col("dtr") - col("seasonal")).as("resid"))
  }

  def m4Downsample(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      valueCol: String,
      tiebreakCol: String,
      bucket: String): DataFrame = {
    df.select(col(groupCol).as("g"),
        date_trunc(bucket, col(tsCol)).as("bucket_start"),
        col(tsCol).as("t"), col(tiebreakCol).as("tb"), col(valueCol).as("v"))
      .groupBy("g", "bucket_start")
      .agg(
        min_by(col("v"), struct(col("t"), col("tb"))).as("v_first"),
        max_by(col("v"), struct(col("t"), col("tb"))).as("v_last"),
        min(col("v")).as("v_min"),
        max(col("v")).as("v_max"),
        count(lit(1)).as("n"))
      .withColumnRenamed("g", groupCol)
  }
}
