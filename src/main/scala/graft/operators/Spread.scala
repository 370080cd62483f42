package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Input-parallelism guard for CPU-heavy per-row stages (shingling, token
  * hashing, stemming, regex profiling).
  *
  * The problem (optimization guide §2.5, "input skew"): a scan whose input
  * arrives in fewer splits than the session has cores runs its ENTIRE
  * map-side stage — including every expensive expression fused above the
  * first exchange — at that split count. The bench's testdata is one
  * single-row-group parquet file per table, so every shingle/stem/regex
  * pass ran in ONE task while 31 cores idled; the same happens in
  * production whenever a corpus lands as a few big gzip/single-row-group
  * files.
  *
  * The fix is the guide's own: repartition immediately after the read —
  * but ONLY when the input is under-split. At real scale a corpus scan
  * arrives in >= cores splits and [[spread]] is a no-op (no extra
  * exchange); the branch is decided at plan time from the scan's actual
  * partition count, not from a constant, so the same code is right at
  * sf0.001 and at 100 TB.
  *
  * Hash-partitioning on the row id (not round-robin) keeps the move
  * deterministic under task retries (SPARK-38388 class of bugs) and avoids
  * round-robin's defensive per-partition sort. Every caller's result is
  * row-set identical under any partitioning (aggregates are commutative,
  * windows carry their own partition/order spec, outputs are re-sorted by
  * the query's ORDER BY), so spreading never changes what a query computes.
  */
object Spread {
  /** `df` hash-repartitioned across the session's cores when its planned
    * scan has fewer partitions; unchanged otherwise. Callers pass every
    * column that makes the hash key high-cardinality — an id alone is not
    * enough where a caller synthesizes a constant id (the decontaminate
    * benchmark side), so text columns ride along.
    */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    // streaming frames can't be planned to an RDD up front (and micro-batches
    // arrive pre-partitioned by the source) — pass them through untouched
    if (df.isStreaming) return df
    if (sys.env.contains("SPARK_GRAFT_NO_SPREAD")) return df // A/B escape hatch
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n, keys: _*)
  }

  def spread(df: DataFrame, key: String): DataFrame =
    spread(df, df.col(key))
}
