package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows whose point value falls inside a right
  * row's [lo, hi] interval. SURVEY §2.C flags this as "perf: custom" — Spark
  * executes the naive formulation as a broadcast-nested-loop / cartesian
  * product, which dies at scale when neither side is broadcastable.
  *
  * [[binned]] is the scale path: quantize the point and the interval onto a
  * fixed bin grid, explode each interval into the bins it covers, and
  * equi-join on the bin key — one hash shuffle each side instead of an n×m
  * loop — then re-check the exact predicate. Results are identical to the
  * naive join (the bin join is a superset of candidates; the residual filter
  * makes it exact). `binWidth` trades explode fan-out (intervals spanning
  * many bins) against candidate noise (many intervals per bin); set it near
  * the typical interval length.
  */
object RangeJoin {

  /** Exact but naive: `point BETWEEN lo AND hi` theta join (+ optional extra
    * equi-keys). Fine when one side broadcasts.
    */
  def naive(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      extraCond: Option[Column] = None): DataFrame = {
    val cond0 = left(pointCol) >= right(loCol) && left(pointCol) <= right(hiCol)
    left.join(right, extraCond.map(cond0 && _).getOrElse(cond0))
  }

  /** Exact range join via bin bucketing. `pointCol`, `loCol`, `hiCol` must
    * be numeric (cast dates/timestamps to epoch upstream). Intervals are
    * exploded into `floor(lo/w)..floor(hi/w)` bin rows; points live in bin
    * `floor(p/w)`; the equi-join on the bin plus the residual BETWEEN filter
    * reproduces the naive semantics with shuffle-hash-join economics.
    */
  def binned(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin", floor(col(pointCol) / binWidth))
    val r = right.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    l.join(r, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Exact INTERVAL-OVERLAP join — both sides are interval relations and a
    * pair qualifies when `[lLo,lHi]` and `[rLo,rHi]` intersect (the temporal
    * overlap predicate `lLo <= rHi AND rLo <= lHi`). Same bin economics as
    * [[binned]]: both sides explode onto the bin grid and meet in an
    * equi-join on `(bin, extraKeys)`; a pair sharing several bins would
    * duplicate, so only the FIRST shared bin — `max(floor(lLo/w),
    * floor(rLo/w))`, which every overlapping pair shares by construction —
    * emits it, making the result exactly the theta join's without a
    * distinct pass. Column names must be disjoint apart from `extraKeys`
    * (rename upstream, as with any self-join).
    */
  def binnedOverlap(
      left: DataFrame,
      right: DataFrame,
      lLo: String,
      lHi: String,
      rLo: String,
      rHi: String,
      binWidth: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin",
      explode(sequence(floor(col(lLo) / binWidth), floor(col(lHi) / binWidth))))
    val r = right.withColumn("__bin",
      explode(sequence(floor(col(rLo) / binWidth), floor(col(rHi) / binWidth))))
    l.join(r, "__bin" +: extraKeys)
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .where(col("__bin") === greatest(floor(col(lLo) / binWidth), floor(col(rLo) / binWidth)))
      .drop("__bin")
  }
}
