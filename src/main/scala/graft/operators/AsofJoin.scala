package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (temporal) join — an operator the reference dialect reaches through
  * DuckDB's `ASOF JOIN` (delegated surface, SURVEY §2.C) that Spark SQL has
  * no built-in for.
  *
  * Semantics (backward, matching DuckDB `ASOF JOIN … ON l.k = r.k AND l.t >=
  * r.t`): each left row picks the right row with the greatest right-time <=
  * left-time within the same key group; `inner` drops unmatched left rows,
  * `left` keeps them with null payload. `strict = true` gives the `>` / `<`
  * forms (equal-time right rows do not match) — in the union+window plan
  * that is only a flip of the equal-time sort tiebreak.
  *
  * Implementation is the union+window plan, chosen for 100 TB behavior:
  *   - ONE hash-partition shuffle on the key (both sides union first, so
  *     left and right co-locate in the same exchange);
  *   - a single linear window scan per key (no per-row range probe, no
  *     broadcast, no O(left×right) nested loop);
  *   - right payload travels as one struct column so `last(_, ignoreNulls)`
  *     picks all payload fields from the SAME right row atomically.
  * Skewed keys behave like any window skew: mitigate upstream by splitting
  * hot keys on coarse time buckets (the operator itself stays correct).
  */
object AsofJoin {

  /** @param by        equi-key columns present in both sides
    * @param leftTime  left timestamp/numeric column name
    * @param rightTime right timestamp/numeric column name
    * @param rightPayload right columns to carry to the output (must not
    *                     collide with left column names)
    * @param joinType  "inner" or "left"
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      joinType: String = "inner",
      strict: Boolean = false): DataFrame =
    backwardImpl(left, right, by, leftTime, rightTime, rightPayload, joinType, strict, None)

  /** Backward as-of with a maximum match distance (pandas `merge_asof
    * tolerance` semantics): the best right row additionally needs
    * `leftTime - rightTime <= tolerance`, otherwise the left row counts as
    * unmatched (dropped under `inner`, null payload under `left`).
    *
    * Same union+window plan as [[backward]] — the matched right TIME rides
    * inside the payload struct and the tolerance is a map-side post-filter,
    * so the tolerance costs no extra shuffle and no plan change. `tolerance`
    * is any expression comparable against the time domain (an interval for
    * timestamps, a number for numeric times).
    */
  def backwardWithin(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      tolerance: Column,
      joinType: String = "inner",
      strict: Boolean = false): DataFrame =
    backwardImpl(left, right, by, leftTime, rightTime, rightPayload, joinType, strict, Some(tolerance))

  private def backwardImpl(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      joinType: String,
      strict: Boolean,
      tolerance: Option[Column]): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"bad joinType $joinType")
    val leftCols = left.columns.toSeq
    // under a tolerance the matched right TIME rides in the payload struct
    // (hidden "__mt" field) so validity is a map-side check after the window
    val payCols = rightPayload.map(col) ++ tolerance.map(_ => col(rightTime).as("__mt"))
    val pay = struct(payCols: _*)

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(right.select(payCols: _*)
        .schema.fields.foldLeft(new org.apache.spark.sql.types.StructType)((s, f) => s.add(f))))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__rpay", pay)
      .select(by.map(col) ++ Seq(col("__t"), col("__side"), col("__rpay")) ++
        leftCols.filterNot(by.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val unioned = l.select((by.map(col) ++ Seq(col("__t"), col("__side"), col("__rpay")) ++
      leftCols.filterNot(by.contains).map(col)): _*).unionByName(r)

    // right rows (__side=0) sort before left rows at equal time => `>=` ties
    // match, like DuckDB ASOF; strict (`>`) flips the tiebreak so equal-time
    // right rows fall OUTSIDE the left row's frame. `__rpay` is the final
    // sort key: duplicate
    // right rows at the same (key, time) with different payloads would
    // otherwise leave `last(...)` picking a partition-order-dependent winner;
    // ordering by the payload struct makes the winner the greatest payload —
    // deterministic across runs and retries. (Skipped when the payload holds
    // a non-orderable type like a map — Spark can't sort those, and neither
    // could any deterministic rule.)
    val sortKeys = Seq(col("__t").asc,
      if (strict) col("__side").desc else col("__side").asc) ++
      (if (orderablePayload(right, rightPayload)) Seq(col("__rpay").asc_nulls_first) else Nil)
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched0 = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    // tolerance: the best (greatest-time) match must also be close enough;
    // a too-old match makes the row UNMATCHED (not "try the next older row" —
    // older rows are farther still, so the window winner is the only candidate)
    val matched = tolerance match {
      case Some(tol) => matched0.withColumn("__match",
        when(col("__match").isNotNull && col("__match.__mt") >= col("__t") - tol, col("__match")))
      case None => matched0
    }

    val base = if (joinType == "inner") matched.where(col("__match").isNotNull) else matched
    base.select(leftCols.map(col) ++ rightPayload.map(p => col(s"__match.$p").as(p)): _*)
  }

  /** Whether the payload struct can be a window sort key. Delegates to
    * Catalyst's own orderability rules (maps, intervals, variants, …) —
    * hand-rolling the type walk would drift from the engine's. Field lookup
    * is case-insensitive to match column resolution; a payload name that
    * doesn't resolve here is left for Spark's own error path.
    */
  private def orderablePayload(right: DataFrame, rightPayload: Seq[String]): Boolean =
    rightPayload.forall { p =>
      right.schema.fields.find(_.name.equalsIgnoreCase(p)).forall(f =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
    }

  /** NEAREST as-of (pandas `merge_asof direction='nearest'` / kdb `aj`'s
    * closest-match cousin): for every left row pick the right row with the
    * smallest |leftTime - rightTime| within the key, backward winning
    * distance ties. Optional `tolerance` bounds the match distance on both
    * sides (an unmatched row drops under `inner`, keeps null payload under
    * `left`).
    *
    * Plan: the SAME single union as backward/forward, ONE hash exchange on
    * the key, then the two direction scans as two window sorts over that
    * exchange's output (Catalyst reuses the partitioning; only the sort
    * differs) — never a range join or a per-row probe. The matched right
    * time rides in the payload struct (`__mt`) so distance comparison and
    * tolerance are map-side expressions after the windows.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      joinType: String = "inner",
      tolerance: Option[Column] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"bad joinType $joinType")
    val leftCols = left.columns.toSeq
    val payCols = rightPayload.map(col) :+ col(rightTime).as("__mt")
    val pay = struct(payCols: _*)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(right.select(payCols: _*)
        .schema.fields.foldLeft(new org.apache.spark.sql.types.StructType)((s, f) => s.add(f))))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__rpay", pay)
      .select(by.map(col) ++ Seq(col("__t"), col("__side"), col("__rpay")) ++
        leftCols.filterNot(by.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l.select((by.map(col) ++ Seq(col("__t"), col("__side"), col("__rpay")) ++
      leftCols.filterNot(by.contains).map(col)): _*).unionByName(r)
    // equal-(key,time) rights sort before the left row in BOTH directions
    // (ties match, distance 0); payload tiebreak as in backward/forward
    val sortTail = Seq(col("__side").asc) ++
      (if (orderablePayload(right, rightPayload)) Seq(col("__rpay").asc_nulls_first) else Nil)
    def lastOver(timeKey: Column) = last(col("__rpay"), ignoreNulls = true).over(
      Window.partitionBy(by.map(col): _*)
        .orderBy(timeKey +: sortTail: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val both = unioned
      .withColumn("__mb", lastOver(col("__t").asc))
      .withColumn("__mf", lastOver(col("__t").desc))
      .where(col("__side") === 1)
    def valid(m: Column, dist: Column): Column = tolerance match {
      case Some(tol) => when(m.isNotNull && dist <= tol, m)
      case None      => m
    }
    val withV = both
      .withColumn("__vb", valid(col("__mb"), col("__t") - col("__mb.__mt")))
      .withColumn("__vf", valid(col("__mf"), col("__mf.__mt") - col("__t")))
    val matched = withV.withColumn("__match",
      when(col("__vb").isNotNull && (col("__vf").isNull ||
          (col("__t") - col("__vb.__mt")) <= (col("__vf.__mt") - col("__t"))),
        col("__vb"))
        .otherwise(col("__vf")))
    val base = if (joinType == "inner") matched.where(col("__match").isNotNull) else matched
    base.select(leftCols.map(col) ++ rightPayload.map(p => col(s"__match.$p").as(p)): _*)
  }

  /** Direction-dispatch convenience (used by the SQL front-end's ASOF stage). */
  def backwardOrForward(
      backward: Boolean,
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      joinType: String,
      strict: Boolean = false): DataFrame =
    if (backward) this.backward(left, right, by, leftTime, rightTime, rightPayload, joinType, strict)
    else forward(left, right, by, leftTime, rightTime, rightPayload, joinType, strict)

  /** Forward as-of: smallest right-time >= left-time (DuckDB `l.t <= r.t`);
    * `strict` gives the `<` form. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      joinType: String = "inner",
      strict: Boolean = false): DataFrame = {
    // mirror: negate the time ordering by sorting desc and reusing `last`
    val leftCols = left.columns.toSeq
    val pay = struct(rightPayload.map(col): _*)
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(right.select(rightPayload.map(col): _*)
        .schema.fields.foldLeft(new org.apache.spark.sql.types.StructType)((s, f) => s.add(f))))
    val r = right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0)).withColumn("__rpay", pay)
      .select(by.map(col) ++ Seq(col("__t"), col("__side"), col("__rpay")) ++
        leftCols.filterNot(by.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l.select((by.map(col) ++ Seq(col("__t"), col("__side"), col("__rpay")) ++
      leftCols.filterNot(by.contains).map(col)): _*).unionByName(r)
    // payload tiebreak mirrors backward: at equal (key, time) the winner is
    // the greatest payload struct, not whichever row the scan saw last
    val sortKeys = Seq(col("__t").desc,
      if (strict) col("__side").desc else col("__side").asc) ++
      (if (orderablePayload(right, rightPayload)) Seq(col("__rpay").asc_nulls_first) else Nil)
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val base = if (joinType == "inner") matched.where(col("__match").isNotNull) else matched
    base.select(leftCols.map(col) ++ rightPayload.map(p => col(s"__match.$p").as(p)): _*)
  }
}
