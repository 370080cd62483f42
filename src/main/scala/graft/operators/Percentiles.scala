package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe EXACT interpolated percentiles (`quantile_cont`) per group.
  *
  * Both obvious formulations collapse at 100 TB when group cardinality is
  * low (the common analytics case — e.g. 3 `l_returnflag` groups):
  *   - Spark's `percentile` is a `TypedImperativeAggregate` whose FINAL
  *     buffer holds EVERY value of the group on one executor;
  *   - a window (`row_number` over `partition by g order by v`) sorts each
  *     group inside ONE task — same single-machine bottleneck.
  *
  * This operator computes the same exact answer with nothing larger than a
  * partition anywhere (the TeraSort-style distributed selection):
  *   1. global range-partitioned sort on (group, value) — Spark's `orderBy`
  *     spreads the sort across the cluster regardless of group count;
  *   2. contiguous global row index (`zipWithIndex`: one count job, no data
  *     movement);
  *   3. per-group offsets/counts — an ordinary hash aggregate, rows = one
  *     per group;
  *   4. each requested percentile p needs the group-local ranks
  *     `floor/ceil(p*(n-1))`, i.e. two GLOBAL indexes per (group, p) —
  *     a tiny broadcast join picks those rows off the indexed data;
  *   5. linear interpolation `v_lo + (v_hi − v_lo)·frac` (the
  *     `quantile_cont` / Spark `percentile` formula), pivoted to one row
  *     per group.
  *
  * NULL values are excluded, like both engines' aggregate semantics; a
  * group whose values are all NULL yields no row (Spark's percentile would
  * yield NULL — filter upstream if that distinction matters).
  */
object Percentiles {

  /** @param ps (outputColumn, fraction) pairs, e.g. Seq("p50" -> 0.5) */
  def exactByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    exactByGroupMulti(df, groupCol, Seq(valueCol -> ps))

  /** [[exactByGroup]] over SEVERAL value columns in ONE pass (r17): the
    * columns union into (columnId, group, value) rows so the whole request
    * costs one global sort + one row-index pass + one rank-pick join
    * instead of one full pipeline per column — same distributed-selection
    * plan, same exact values, sort volume Σ|columns| either way. Output:
    * one row per group carrying every requested percentile alias (aliases
    * must be globally unique).
    *
    * @param specs (valueColumn, (outputColumn, fraction) pairs) per column
    */
  def exactByGroupMulti(
      df: DataFrame,
      groupCol: String,
      specs: Seq[(String, Seq[(String, Double)])]): DataFrame = {
    require(specs.nonEmpty && specs.forall(_._2.nonEmpty))
    val ps = specs.flatMap(_._2)
    require(ps.forall { case (_, p) => p >= 0 && p <= 1 })
    require(ps.map(_._1).distinct.size == ps.size,
      "exactByGroupMulti: output aliases must be unique across columns")
    val sorted = specs.zipWithIndex.map { case ((valueCol, _), ci) =>
        df.select(lit(ci).as("__c"), col(groupCol).as("__g"),
          col(valueCol).cast("double").as("__v"))
      }.reduce(_.unionAll(_))
      .where(col("__v").isNotNull)
      .orderBy("__c", "__g", "__v")
    // the indexed data feeds the group aggregation and both rank-pick joins;
    // Spark's shuffle-stage reuse means those three consumers re-read the
    // sort's shuffle files (sequential scans) rather than re-sorting — no
    // checkpoint needed, and measured faster than an eager materialization
    val indexed = PositionalJoin.withRowIndex(sorted, "__idx")
    val groups = indexed.groupBy("__c", "__g")
      .agg(min("__idx").as("__off"), count(lit(1)).as("__n"))
    // one target row per (group, percentile) from a SINGLE pass over the
    // group aggregates: explode a literal (name, fraction) array — picked
    // per column id — rather than unioning one aggregation subplan per
    // percentile
    val psByCol = specs.zipWithIndex.map { case ((_, cps), ci) =>
      ci -> array(cps.map { case (name, p) =>
        struct(lit(name).as("name"), lit(p).as("p"))
      }: _*)
    }
    val psLit = psByCol.tail.foldLeft(
      when(col("__c") === psByCol.head._1, psByCol.head._2)) {
      case (acc, (ci, arr)) => acc.when(col("__c") === ci, arr)
    }
    val pos = col("pp.p") * (col("__n") - 1).cast("double")
    val targets = groups
      .select(col("__g"), col("__off"), col("__n"), explode(psLit).as("pp"))
      .select(
        col("__g"), col("pp.name").as("__p"),
        (col("__off") + floor(pos).cast("long")).as("__lo"),
        (col("__off") + ceil(pos).cast("long")).as("__hi"),
        (pos - floor(pos)).as("__frac"))
    // rows-per-target is 2 of the whole dataset: explode each target into
    // its lo and hi global indexes and broadcast that tiny frame into ONE
    // equi-join pass over the indexed data (two separate lo/hi joins would
    // scan it twice), then fold the pair back together in a pea-sized agg
    val sides = targets.select(col("__g"), col("__p"), col("__frac"),
        explode(array(
          struct(col("__lo").as("__idx"), lit(true).as("__isLo")),
          struct(col("__hi").as("__idx"), lit(false).as("__isLo")))).as("t"))
      .select(col("__g"), col("__p"), col("__frac"),
        col("t.__idx").as("__idx"), col("t.__isLo").as("__isLo"))
    val picked = indexed.select(col("__idx"), col("__v"))
      .join(broadcast(sides), Seq("__idx"))
      .groupBy("__g", "__p", "__frac")
      .agg(min(when(col("__isLo"), col("__v"))).as("__vlo"),
        min(when(!col("__isLo"), col("__v"))).as("__vhi"))
      .withColumn("__val", col("__vlo") + (col("__vhi") - col("__vlo")) * col("__frac"))
    picked.groupBy(col("__g").as(groupCol))
      .pivot("__p", ps.map(_._1))
      .agg(first("__val"))
  }
}
