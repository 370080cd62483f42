package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the engine-side analogue of DuckDB's `SUMMARIZE`
  * (duckdb-psql users profile staged tables before piping them; cf.
  * reference README.md's exploratory workflow): per-column fill, null
  * count, exact distinct cardinality and min/max, emitted in LONG format
  * (one row per column) so the profile of any table has one fixed schema.
  *
  * Scale shape: ONE scan computes every non-distinct stat via map-side
  * partial aggregation into a single 1-row frame; the long-format pivot is
  * a map-side explode of that row (output = |cols| rows, never
  * input-sized). Exact distinct counts are the one concession to parity —
  * NOT via `count(distinct …)` (Spark plans multiple distincts through one
  * Expand that multiplies the full scan |cols|+1 times before any combine —
  * measured 6+ s at sf0.1 where the restructured plan takes ~1 s) but as
  * one NARROW branch per column: project the single column (parquet
  * pruning makes the re-scan column-proportional), partial-aggregate
  * distinct values map-side, count — each branch's shuffle carries
  * distinct VALUES only, never rows. The approximate profile
  * (`exact = false`) swaps the branches for mergeable HLL sketches in the
  * main aggregate (±~2.3%) and is strictly single-pass — the 100 TB
  * default, same sketch economics as q51's approx_count_distinct.
  *
  * min/max surface as strings so numeric, date and varchar columns share
  * the schema. Float/double columns render through [[Fp.fmt6]] — neither
  * engine's native double→string is cross-engine stable above 1e7 (Java
  * flips to scientific notation; printf `%.6f` still diverges above ~4e9),
  * while the exact-IEEE BIGINT split provably agrees below 1e15 and
  * degrades explicitly (`%.6e`) beyond. Other types cast natively (ints,
  * dates, timestamps and varchars print identically in both engines).
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "summarize: need at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"summarize: no column '$c'"))
    val floaty: Set[String] = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.DoubleType ||
        f.dataType == org.apache.spark.sql.types.FloatType => f.name
    }.toSet
    def asString(c: org.apache.spark.sql.Column, name: String) =
      if (floaty(name)) Fp.fmt6(c) else c.cast("string")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        asString(min(col(c)), c).as(s"${c}__min"),
        asString(max(col(c)), c).as(s"${c}__max")) ++
        (if (exact) Nil else Seq(approx_count_distinct(col(c)).as(s"${c}__distinct")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__n").as("n_filled"),
        col(s"${c}__nulls").as("n_nulls"),
        (if (exact) lit(0L) else col(s"${c}__distinct")).as("n_distinct"),
        col(s"${c}__min").as("min_s"),
        col(s"${c}__max").as("max_s"))
    }
    val base = one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
    if (!exact) base
    else {
      // count(col) over the distinct frame skips the one possible null row,
      // matching count(DISTINCT c) semantics exactly
      val nd = cols.map { c =>
        df.select(col(c).as("v")).distinct()
          .agg(count(col("v")).as("nd"))
          .select(lit(c).as("col_name"), col("nd"))
      }.reduce(_ union _)
      base.drop("n_distinct")
        .join(broadcast(nd), Seq("col_name"))
        .select(col("col_name"), col("n_filled"), col("n_nulls"),
          col("nd").as("n_distinct"), col("min_s"), col("max_s"))
    }
  }

  /** DuckDB `SUMMARIZE` twin — the statement's EXACT output shape (probed
    * on 1.0.0): (column_name, column_type, min, max, approx_unique, avg,
    * std, q25, q50, q75, count, null_percentage), one row per column in
    * table order, DuckDB type names, VARCHAR stat columns, `count` = total
    * rows, null_percentage DECIMAL(9,2).
    *
    * Cross-engine contract: column_name / column_type / min / max / count /
    * null_percentage are exact for non-float columns (float renderings are
    * engine-local shortest-repr — the seam [[Fp]] documents); avg/std and
    * the quartiles are numeric-only (NULL elsewhere, as DuckDB emits) and
    * approx_unique is an HLL ESTIMATE in both engines — never
    * oracle-compare those. Scale shape: ONE aggregate pass (map-side
    * combined), |cols|-row output via explode — the same single-scan
    * discipline as [[summarize]].
    */
  def duckSummarize(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    require(df.columns.nonEmpty, "duckSummarize: no columns")
    def duckType(dt: DataType): String = dt match {
      case LongType            => "BIGINT"
      case IntegerType         => "INTEGER"
      case ShortType           => "SMALLINT"
      case ByteType            => "TINYINT"
      case DoubleType          => "DOUBLE"
      case FloatType           => "FLOAT"
      case StringType          => "VARCHAR"
      case BooleanType         => "BOOLEAN"
      case DateType            => "DATE"
      case TimestampType       => "TIMESTAMP"
      case d: DecimalType      => s"DECIMAL(${d.precision},${d.scale})"
      case BinaryType          => "BLOB"
      case ArrayType(e, _)     => duckType(e) + "[]"
      case other               => other.sql
    }
    val numeric: Set[String] = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSet
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        approx_count_distinct(col(c)).as(s"${c}__au"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls")) ++
        (if (numeric(c)) Seq(
          avg(col(c)).cast("string").as(s"${c}__avg"),
          stddev_samp(col(c)).cast("string").as(s"${c}__std"),
          percentile_approx(col(c), lit(0.25), lit(10000)).cast("string").as(s"${c}__q25"),
          percentile_approx(col(c), lit(0.5), lit(10000)).cast("string").as(s"${c}__q50"),
          percentile_approx(col(c), lit(0.75), lit(10000)).cast("string").as(s"${c}__q75"))
        else Nil)
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val nullStr = lit(null).cast("string")
    val rows = cols.map { c =>
      def s(suffix: String) = col(s"${c}__$suffix")
      struct(
        lit(c).as("column_name"),
        lit(duckType(df.schema(c).dataType)).as("column_type"),
        s("min").as("min"),
        s("max").as("max"),
        s("au").as("approx_unique"),
        (if (numeric(c)) s("avg") else nullStr).as("avg"),
        (if (numeric(c)) s("std") else nullStr).as("std"),
        (if (numeric(c)) s("q25") else nullStr).as("q25"),
        (if (numeric(c)) s("q50") else nullStr).as("q50"),
        (if (numeric(c)) s("q75") else nullStr).as("q75"),
        col("__total").as("count"),
        round(s("nulls") * lit(100.0) / col("__total"), 2)
          .cast("decimal(9,2)").as("null_percentage"))
    }
    one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
  }
}
