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

  /** Contiguous global row index appended in Tungsten format (r17): the
    * earlier `df.rdd.zipWithIndex` deserialized every field to external Scala
    * objects and `createDataFrame` re-encoded them — two full per-row
    * conversions that exist only to carry one extra long. This version zips
    * the INTERNAL row stream and re-projects to unsafe rows in place; the
    * index values and schema are identical.
    */
  def withRowIndex(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
    val spark = df.sparkSession
    val schema = df.schema.add(name, LongType, nullable = false)
    val rdd: org.apache.spark.rdd.RDD[InternalRow] =
      df.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
        val joined = new JoinedRow
        val idxRow = new SpecificInternalRow(Seq(LongType))
        val proj = UnsafeProjection.create(schema)
        it.map { case (row, i) =>
          idxRow.setLong(0, i)
          proj(joined(row, idxRow)) // buffer reuse is safe: consumers copy on buffer
        }
      }
    org.apache.spark.sql.graftbridge.ColumnBridge.internalDataFrame(spark, rdd, schema)
  }
}
