package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins and aggregations — the manual guard for
  * when AQE's runtime skew splitting isn't available (e.g. the skew is in a
  * broadcast-ineligible build side, or a single hot key dwarfs the
  * `skewedPartitionThreshold`). A hot key that lands `K` times the average
  * on one reducer caps that stage's parallelism at 1; salting spreads it
  * over `saltFactor` reducers at the cost of replicating the other side
  * `saltFactor` times.
  */
object SkewJoin {

  /** Equi-join `left ⋈ right` on `key`, with the left (large, skewed) side
    * salted: each left row gets a deterministic pseudo-random salt in
    * [0, saltFactor); the right side is replicated once per salt value. The
    * join key becomes (key, salt), so a hot key's rows fan out over
    * `saltFactor` reducers. Semantics are exactly the inner equi-join.
    *
    * Use when `right` is too big to broadcast but small enough to replicate
    * `saltFactor`× through one shuffle (dim-like tables).
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    // per-row salt from the row's position (partition id + offset), NOT a
    // content hash: byte-identical duplicate rows — the normal shape of a
    // hot key — must still spread over all saltFactor reducers. Position is
    // stable under task retry for deterministic inputs (same partition,
    // same order), unlike rand().
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation: `count`/`sum`-style aggregates over a
    * skewed group key. Phase 1 aggregates on (key, salt) — the hot key's
    * rows combine on `saltFactor` reducers — phase 2 merges the partials on
    * the key alone, touching only `groups × saltFactor` rows.
    *
    * Note Spark's hash aggregate already does map-side partial combine,
    * which handles most skew; this pattern matters when the *distinct
    * group count per hot key region* overflows the map-side hash table
    * (e.g. high-cardinality sub-aggregations), or for `collect_*`-style
    * aggregates with no partial combine.
    */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("total"))
  }
}
