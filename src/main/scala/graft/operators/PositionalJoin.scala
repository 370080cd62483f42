package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** POSITIONAL join — row-order zip of two relations, as DuckDB's
  * `POSITIONAL JOIN` (delegated surface, SURVEY §2.C; no Spark built-in).
  * The shorter side pads with NULLs, like DuckDB.
  *
  * Row order in a distributed engine is only meaningful for inputs with a
  * defined order, so callers should pass sorted frames (a global sort
  * range-partitions, and `zipWithIndex` then numbers rows in partition
  * order => global order). `monotonically_increasing_id` is NOT usable here:
  * its ids are non-contiguous across partitions.
  *
  * Scale: `zipWithIndex` is one extra job to count per-partition sizes (no
  * data movement), then the equi-join on the index is an ordinary shuffle
  * join. Linear, no driver collection.
  */
object PositionalJoin {

  def join(left: DataFrame, right: DataFrame): DataFrame = {
    val l = withRowIndex(left, "__pos")
    val r = withRowIndex(right, "__pos")
    l.join(r, Seq("__pos"), "full_outer").sort("__pos").drop("__pos")
  }

  def withRowIndex(df: DataFrame, name: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(name, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (row, i) => Row.fromSeq(row.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }
}
