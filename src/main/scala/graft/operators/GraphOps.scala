package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-graph quality scoring for corpus curation: link-based authority
  * signals (PageRank, Page et al. 1999) of the kind production pretraining
  * pipelines use to weight or filter crawled pages (e.g. seed-quality
  * propagation in CommonCrawl curation).
  *
  * The rank arithmetic is FIXED-POINT INTEGER on purpose: every rank is a
  * BIGINT number of 1e-12 "mass units", damping is `x * 85 div 100`, and
  * per-edge contributions are `rank div outdeg`. Integer addition is
  * order-independent, so the result is bit-identical across engines,
  * partitionings and retries — the property that lets a DuckDB oracle
  * hash-check the whole iteration, where floating-point PageRank would
  * drift in the last ulp per shuffle order. The quantization error is
  * bounded by one unit per edge per iteration (≤ outdeg · 1e-12), far below
  * any ranking-relevant difference. Dangling-node mass is dropped (the
  * classic "no sink handling" simplification), documented here.
  *
  * Scale shape (100 TB): edges are deduped and hash-partitioned on `src`
  * ONCE and reused by every iteration (localCheckpoint pins the layout, so
  * the per-iteration cost is the rank stream's two exchanges — join on src,
  * re-aggregate on dst — the canonical distributed-PageRank shuffle
  * pattern). The only driver-side scalar is the node count. Rank state is
  * never collected or broadcast: at web scale both sides of the iteration
  * join are large, and a broadcast would cap the graph at driver memory.
  */
object GraphOps {

  /** @param edges      directed edge list (duplicates allowed — deduped)
    * @param srcCol     source node id column (integral)
    * @param dstCol     destination node id column (integral)
    * @param iterations fixed iteration count (the cross-engine-checkable
    *                   termination rule; convergence-delta stopping would
    *                   need a per-iteration driver action)
    * @param dampingPct damping factor as an integer percentage (85 = 0.85)
    * @param scale      fixed-point scale: total graph mass in units
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 10,
      dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"pageRank: iterations must be in [1,100], got $iterations")
    require(dampingPct >= 1 && dampingPct <= 99,
      s"pageRank: dampingPct must be in [1,99], got $dampingPct")
    // 85 * mass(scale) must stay inside Long
    require(scale <= Long.MaxValue / 100,
      s"pageRank: scale $scale too large for the damping multiply")

    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src"))     // iteration joins probe on src: fix the layout once
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val n = nodes.count()          // the one driver scalar (a single long)
    require(n > 0, "pageRank: empty graph")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint(false)
    val base = (scale * (100 - dampingPct) / 100) / n   // exact integer, same in the oracle

    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (i <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
      val summed = contrib.groupBy("node").agg(sum(col("c")).as("csum"))
      ranks = nodes.join(summed, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampingPct * coalesce(csum, 0L)) div 100")).as("rank"))
      // bound lineage depth: a 50-iteration plan would re-derive every prior
      // join at action time without a periodic cut
      if (i % 5 == 0 && i < iterations) ranks = ranks.localCheckpoint(false)
    }
    ranks
  }

  /** Top-k authorities by (rank desc, node asc) — sort+limit compiles to
    * TakeOrderedAndProject (per-partition top-N, bounded merge). */
  def pageRankTopK(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      iterations: Int = 10): DataFrame =
    pageRank(edges, srcCol, dstCol, iterations)
      .orderBy(col("rank").desc, col("node").asc)
      .limit(k)
}
