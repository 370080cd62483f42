package graft

import org.apache.spark.sql.functions._

/** The fixed-centroid oracle-parity family (d21 IVF assignment, d22
  * SemDeDup survivors): the gate hash-checks both rows against DuckDB SQL
  * generated with the trained centroids as literals; this spec pins the
  * pieces the hash alone doesn't say — that the rounded assignment rule is
  * the same ROUTING as the production full-precision kernel (not a
  * different semantics), that the survivor set satisfies SemDeDup's
  * invariants, and that centroid training is deterministic so the two
  * engines ever see the same literals at all.
  */
class FixedCentroidParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fixed centroids are deterministic per sfDir (what makes oracle generation sound)") {
    // touch `spark` first: fixedCentroids resolves the session via
    // getActiveSession/getDefaultSession, which exist only once built
    val b = operators.Similarity.trainCentroids(
      spark.read.parquet(s"$sf/embeddings.parquet"), "vec_id", "embedding", 16)
    val a = OpsEntry.fixedCentroids(sf)
    assert(a.length == 16 && a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("d21 rounded assignment routes like the production topCentroids kernel off ties") {
    Tables.register(spark, sf)
    val d21 = SparkEntry.queries("d21_ivf_assign_parity")(spark, sf)
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cents = OpsEntry.fixedCentroids(sf)
    import graft.functions.VectorFunctions.topCentroids
    val prod = spark.table("embeddings")
      .select(col("vec_id"),
        element_at(topCentroids(col("embedding").cast("array<double>"), cents, 1), 1).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d21.keySet == prod.keySet)
    // the two rules may legally differ only where the top-2 similarities tie
    // at 6 dp; count the disagreements and require each one IS such a tie
    import spark.implicits._
    val centDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "cent")
    val top2 = spark.table("embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(centDf))
      .select(col("vec_id"),
        round(operators.Similarity.cosine(col("v"), col("cent")), 6).as("sim"))
      .groupBy("vec_id").agg(sort_array(collect_list("sim"), asc = false).as("sims"))
      .select(col("vec_id"), element_at(col("sims"), 1).as("s1"), element_at(col("sims"), 2).as("s2"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1) == r.getDouble(2))).toMap
    val disagree = d21.keys.filter(id => d21(id) != prod(id))
    disagree.foreach { id =>
      assert(top2(id), s"vec $id routed differently without a 6-dp tie: d21=${d21(id)} prod=${prod(id)}")
    }
  }

  test("d23 probed top-k equals the production ivfTopK on this corpus (same centroids, same probes)") {
    Tables.register(spark, sf)
    val emb = spark.table("embeddings")
    val d23 = SparkEntry.queries("d23_ivf_topk_parity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    // production ivfTopK trains the same deterministic centroids from the
    // same corpus — identical routing except at 6-dp rounding ties, of
    // which this corpus has none (the d21 spec checks that), so the two
    // retrieval paths must return the same ranked lists
    val prod = operators.Similarity.ivfTopK(
      emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
      k = 5, nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(d23.keySet == prod.keySet)
    d23.foreach { case (k, v) => assert(prod(k) == v, s"$k: parity $v vs production ${prod(k)}") }
  }

  test("d24 LSH top-k equals the production lshTopK on this corpus (same planes, same buckets)") {
    Tables.register(spark, sf)
    val emb = spark.table("embeddings")
    val d24 = SparkEntry.queries("d24_lsh_topk_parity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    // the parity bucket rule signs round(cosine, 6); the production kernel
    // signs the raw dot — identical unless some |cosine(v, plane)| < 5e-7,
    // which this corpus has none of, so candidate sets and rankings agree
    val prod = operators.Similarity.lshTopK(
      emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
      k = 5, nPlanes = 4, nTables = 8, dimension = Some(64))
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(d24.keySet == prod.keySet)
    d24.foreach { case (k, v) => assert(prod(k) == v, s"$k: parity $v vs production ${prod(k)}") }
  }

  test("d28 LSH near-dup pairs equal the production embeddingNearDupPairsLsh (same planes)") {
    Tables.register(spark, sf)
    val d28 = SparkEntry.queries("d28_lsh_neardup_parity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // same sign-rule caveat as the d24 spec: parity signs round(cosine, 6),
    // production signs the raw dot — identical off |cosine| < 5e-7
    val prod = operators.Dedup.embeddingNearDupPairsLsh(
      spark.table("embeddings"), "vec_id", "embedding",
      threshold = 0.4, nPlanes = 4, nTables = 8, dim = Some(64))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(d28.keySet == prod.keySet, s"only-parity=${d28.keySet -- prod.keySet} only-prod=${prod.keySet -- d28.keySet}")
    d28.foreach { case (k, v) => assert(prod(k) == v, s"$k: parity $v vs production ${prod(k)}") }
    assert(d28.nonEmpty)
  }

  test("d25 ADC ranking equals the production pqTopK(rerank=0) on this corpus") {
    Tables.register(spark, sf)
    val emb = spark.table("embeddings")
    // d25 scores dot(unit q, decoded); production LUTs use the RAW query —
    // a positive per-query scale, so the per-query RANKINGS must agree
    // (same codebooks, same codes off rounded-argmin ties, none here)
    val d25 = SparkEntry.queries("d25_pq_adc_parity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val prod = operators.Similarity.pqTopK(
      emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
      k = 5, m = 8, kCent = 16, rerank = 0)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(d25.keySet == prod.keySet)
    d25.foreach { case (k, v) => assert(prod(k) == v, s"$k: parity $v vs production ${prod(k)}") }
  }

  test("parity rows keep scale-sane plans: tiny codebooks broadcast, bucket join never cartesian") {
    Tables.register(spark, sf)
    // d21: the 16-row centroid table rides a broadcast; the corpus never
    // shuffles for the assignment (window partitions by vec_id AFTER the
    // broadcast join — one exchange of (vec_id, sims), no vector re-shuffle)
    val d21 = SparkEntry.queries("d21_ivf_assign_parity")(spark, sf)
    val p21 = d21.queryExecution.executedPlan.toString
    assert(p21.contains("Broadcast"), p21)
    // d24: candidate generation is an equi-join on (tbl, bucket) — a plan
    // with CartesianProduct would be the corpus-squared disaster the
    // banding exists to avoid
    val d24 = SparkEntry.queries("d24_lsh_topk_parity")(spark, sf)
    val p24 = d24.queryExecution.executedPlan.toString
    assert(!p24.contains("CartesianProduct"), p24)
    // d25's final query×corpus join IS an intentional bounded cross join
    // (≤10 queries by construction) — no pin, documented here
  }

  test("d22 survivors satisfy SemDeDup's invariants (one survivor per in-cluster dup group)") {
    Tables.register(spark, sf)
    val rows = SparkEntry.queries("d22_semdedup_parity")(spark, sf).collect()
    val survivors = rows.map(_.getLong(0)).toSet
    val all = spark.table("embeddings").select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors.nonEmpty && survivors.subsetOf(all))
    assert(survivors.size < all.size, "eps=0.4 drops some semantic dups on this corpus")
    // every component label is a member id <= all its members' ids
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0)))
    // exactly one survivor per component label
    val comps = rows.map(_.getLong(1))
    assert(comps.distinct.length == comps.length)
  }
}
