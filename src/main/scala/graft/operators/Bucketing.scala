package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed warehouse materialization — the co-located-join primitive for
  * repeated large-x-large joins at warehouse scale: write both sides
  * bucketed (and sorted) by the join key ONCE, and every subsequent join on
  * that key runs with NO shuffle on either side — Spark's scan reports the
  * bucket spec as its output partitioning, so the exchange the join would
  * otherwise insert (the dominant cost of a 100 TB fact-fact join) simply
  * disappears. This is the storage-layout counterpart of
  * [[SkewJoin.saltedEquiJoin]]: salting rescues one skewed run, bucketing
  * amortizes the shuffle across every future run.
  *
  * Buckets must agree on count and key for the exchange-free plan; the
  * helper owns that invariant by writing both sides itself.
  */
object Bucketing {

  /** Drop `table` from BOTH layers — catalog AND its warehouse directory.
    * A previous SESSION may have left the directory behind while this
    * session's in-memory catalog has no entry for it; the create path then
    * refuses the existing location. Shared by every (re)materializing
    * writer here (review finding: the block lived in four copies).
    */
  private[graft] def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    // a db-qualified name drops inside that database and cleans the
    // database's OWN location (not the warehouse root); bare names keep the
    // original warehouse-root cleanup
    val parts = table.split('.')
    if (parts.length == 2) {
      spark.sql(s"DROP TABLE IF EXISTS `${parts(0)}`.`${parts(1)}`")
      val dbLoc =
        try spark.catalog.getDatabase(parts(0)).locationUri
        catch { case _: Throwable => return }
      val loc = new org.apache.hadoop.fs.Path(dbLoc, parts(1).toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    } else {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }

  /** Write `df` as a bucketed+sorted warehouse table (overwriting any
    * previous version) and return the table-backed frame.
    *
    * The pre-write repartition pins the FILE COUNT to `buckets` (r17):
    * Spark's bucketed writer emits one file per (task × bucket), so an
    * input arriving in many partitions writes tasks×buckets small files —
    * every later probe pays the listing/open cost. Clustering on the
    * bucket hash first (the same `pmod(hash(key), buckets)` the bucket
    * spec uses, cf. [[compactBucketed]]) gives each task whole buckets:
    * exactly one file per bucket, written in parallel across buckets.
    */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"writeBucketed: buckets must be positive, got $buckets")
    dropTableAndLocation(spark, table)
    df.repartition(buckets, pmod(hash(col(key)), lit(buckets)))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
    spark.table(table)
  }

  /** Write `df` as a hive-layout PARTITIONED warehouse table (one
    * directory per `partitionCol` value, overwriting any previous
    * version) and return the table-backed frame. The partition-pruning
    * counterpart of [[writeBucketed]]: bucketing kills the JOIN shuffle,
    * partitioning kills the SCAN — a predicate on the partition column
    * prunes whole directories at planning time (`PartitionFilters` on the
    * scan node, pinned in PlanQualitySpec), so a month query over years
    * of data reads only that month's files. At 100 TB this is the
    * difference between touching 1/80th of the corpus and all of it.
    *
    * Pick a partition column of BOUNDED cardinality (dates, sources,
    * languages — not ids): each distinct value is a directory, and
    * thousands of tiny partitions cost more in listing than they save in
    * pruning.
    */
  def writePartitioned(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      partitionCol: String): DataFrame = {
    dropTableAndLocation(spark, table)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .partitionBy(partitionCol)
      .saveAsTable(table)
    spark.table(table)
  }

  /** Append `df` into an EXISTING hive-partitioned warehouse table (the
    * increment half of [[writePartitioned]]): new files land only under
    * the delta's partition directories — base directories are never
    * rewritten, never re-read. This is what makes a partitioned index
    * GROW-able (d41 mirrors d35's append≡rebuild contract for the IVF
    * index): the increment's write cost scales with |delta|, and the probe
    * path (dynamic partition pruning on the probed values) is oblivious to
    * how many appends built the table. Repeated appends fragment the
    * directories — [[compactPartitioned]] is the matching maintenance op.
    */
  def appendPartitioned(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      partitionCol: String): DataFrame = {
    require(spark.catalog.tableExists(table),
      s"appendPartitioned: table $table does not exist — writePartitioned it first")
    df.write
      .mode(SaveMode.Append)
      .format("parquet")
      .partitionBy(partitionCol)
      .saveAsTable(table)
    spark.table(table)
  }

  /** Small-file compaction for a hive-partitioned warehouse table — the
    * maintenance op every streaming/incremental ingest needs: micro-batch
    * and per-executor writes leave each partition directory with dozens of
    * small files, and at warehouse scale the SCAN cost becomes file-open
    * dominated (listing, footer reads, task-per-file scheduling) long
    * before byte cost matters. Compaction hash-repartitions on the
    * partition column (each value's rows land in exactly one task → one
    * file per directory), preserving content EXACTLY — the gate row proves
    * it by aggregating the compacted table against the original-data
    * oracle. Partitions too large for one file at real scale: split the
    * value space upstream (a salt column in the partition key) rather than
    * asking one task to hold the hot partition anyway.
    *
    * Writes to `destTable` (not in place: Spark refuses to overwrite a
    * table it is concurrently reading, and the two-table shape gives the
    * caller an atomic swap point).
    */
  def compactPartitioned(
      spark: SparkSession,
      srcTable: String,
      destTable: String,
      partitionCol: String): DataFrame = {
    dropTableAndLocation(spark, destTable)
    spark.table(srcTable)
      .repartition(col(partitionCol)) // one shuffle: co-locate each partition's rows
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("maxRecordsPerFile", 0) // no forced splitting; task layout decides
      .partitionBy(partitionCol)
      .saveAsTable(destTable)
    spark.table(destTable)
  }

  /** In-place compaction of a BUCKETED warehouse table — the b04 policy
    * applied to bucketBy layouts: every append-mode bucketed write lands a
    * fresh file per (task, bucket), so a table that takes N appends
    * accumulates ≥N files per bucket and scan/listing cost grows with
    * append COUNT instead of data size. Rewriting through ONE repartition
    * on the BUCKET-ID expression (`pmod(hash(key), buckets)`) puts each
    * bucket's rows in exactly one task, so the bucketed write emits
    * exactly ONE file per bucket, and the rewrite preserves the bucket
    * spec so the co-location invariant (bucketed joins with no exchange)
    * survives verbatim. It must be the bucket-id expression, NOT
    * `repartition(buckets, key)`: reading a bucketed table already
    * satisfies HashPartitioning(key, n), so the planner elides that
    * shuffle and each FILE-split writes its own per-bucket files — exactly
    * the fragmentation being compacted (observed live: 44 → 16 files
    * instead of 4).
    *
    * The rewrite lands in `<table>__compact` and swaps in via
    * ALTER TABLE RENAME (metadata move, no second copy), so readers never
    * see a half-written table under the original name. One shuffle of the
    * table, amortized over every future probe — the same economics as
    * [[compactPartitioned]].
    *
    * Crash window: the rewrite is fully materialized in `__compact` BEFORE
    * the original is dropped, so data is never lost — but a crash between
    * the drop and the rename leaves the result under `<table>__compact`
    * instead of `<table>` (recover by re-issuing the RENAME). Spark's
    * catalog has no atomic two-table swap to close this metadata-only gap.
    */
  def compactBucketed(
      spark: SparkSession,
      table: String,
      key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"compactBucketed: buckets must be positive, got $buckets")
    val tmp = table + "__compact"
    dropTableAndLocation(spark, tmp)
    spark.table(table)
      .repartition(buckets, pmod(hash(col(key)), lit(buckets)))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tmp)
    dropTableAndLocation(spark, table)
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    spark.table(table)
  }

  /** Keyed upsert — DuckDB `INSERT OR REPLACE INTO` semantics with the key
    * named explicitly (parquet warehouse tables carry no PRIMARY KEY
    * metadata to infer it from): rows of `updates` REPLACE target rows
    * sharing the key tuple, unmatched rows append, target rows with no
    * matching update survive verbatim.
    *
    * Scale shape: one left-anti join of the target against the updates'
    * DISTINCT key tuples — incremental batches are small next to the
    * target, so Catalyst broadcasts the key set and the target never
    * shuffles — plus one overwrite. Writes to `destTable` rather than in
    * place (Spark refuses to overwrite a table it is reading; the caller
    * gets an atomic swap point, same rationale as [[compactPartitioned]]).
    * Updates must carry the target's full schema (names matched, order
    * free); the key may be composite.
    */
  def upsert(
      spark: SparkSession,
      srcTable: String,
      updates: DataFrame,
      keys: Seq[String],
      destTable: String): DataFrame = {
    require(keys.nonEmpty, "upsert: need at least one key column")
    // destTable is DROPPED (table + files) before the lazy plan reading
    // srcTable ever executes — an in-place spelling would delete the source
    // under its own scan. Fail loudly instead of destroying data.
    require(!destTable.equalsIgnoreCase(srcTable),
      s"upsert: destTable must differ from srcTable ('$srcTable') — the dest is dropped " +
        "before the source-reading plan runs; write to a new table and swap (see compactBucketed)")
    val target = spark.table(srcTable)
    val missing = target.columns.filterNot(c => updates.columns.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"upsert: updates are missing target columns: ${missing.mkString(", ")}")
    val kept = target.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
    dropTableAndLocation(spark, destTable)
    kept.unionByName(updates.select(target.columns.map(col).toIndexedSeq: _*))
      .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(destTable)
    spark.table(destTable)
  }

  /** SCD2 (slowly-changing-dimension type 2) history build — turn a change
    * LOG (one row per observed attribute state) into interval-versioned
    * dimension history: per key, each change opens a version valid from
    * its own timestamp until the NEXT change (`valid_to` null on the
    * current version, `is_current` flagging it). The standard warehouse
    * materialization that lets fact tables as-of join a dimension "as it
    * was" ([[AsofJoin]] is the query-side counterpart).
    *
    * Scale shape: ONE hash exchange on the key + one window sort — the
    * minimal plan for any per-key ordering; output is change-log sized.
    * The (ts, tiebreak) ordering key must be unique per key, same contract
    * as the OHLC/EWMA family.
    */
  def scd2(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      tiebreakCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2: need at least one attribute column")
    val reserved = Set("valid_from", "valid_to", "is_current")
    val clashing = (attrCols :+ keyCol).filter(c => reserved(c.toLowerCase))
    require(clashing.isEmpty,
      s"scd2: ${clashing.mkString(", ")} collide with the output interval columns " +
        "(valid_from/valid_to/is_current) — rename them upstream")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tiebreakCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", lead(col(tsCol), 1).over(w).isNull)
      .select((Seq(col(keyCol)) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }

  /** Materialize both sides bucketed on the join key and return their
    * shuffle-free equi-join. `buckets` sizes the layout: at warehouse scale
    * pick it so one bucket of the LARGER side fits an executor's memory
    * (the same arithmetic as sizing `spark.sql.shuffle.partitions`).
    */
  def coLocatedJoin(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int,
      leftTable: String = "graft_bucketed_left",
      rightTable: String = "graft_bucketed_right"): DataFrame = {
    val l = writeBucketed(spark, left, leftTable, key, buckets)
    val r = writeBucketed(spark, right, rightTable, key, buckets)
    l.join(r, key)
  }
}
