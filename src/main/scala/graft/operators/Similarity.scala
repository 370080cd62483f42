package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) — north-star
  * scope. Brute-force cosine top-k is the exact baseline; hyperplane-LSH
  * bucketing is the scale path (candidates shrink from n·m to bucket-local).
  * All math is double-precision higher-order functions (sequential fold, so
  * results are bit-stable and engine-comparable); no UDFs.
  */
object Similarity {

  /** Cosine similarity between two array<double> columns (cast upstream). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Queries × corpus join; fine when queries are few or either side is
    * broadcastable. Deterministic: rank on (rounded sim desc, id).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 of the index pair, scaled to [-1, 1). Fixed by construction —
    * every executor computes the same planes with no broadcast state.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (xxhash64(concat_ws(":", lit(plane), dim)).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-bit bucket id from `nPlanes` random hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val dotp = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dotp >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Approximate top-k: bucket corpus and queries with hyperplane LSH, only
    * compare within the same bucket. Recall measured in the spec against
    * [[bruteForceTopK]]. `nPlanes` trades recall vs candidate count
    * (buckets ≈ 2^nPlanes).
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), nPlanes))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), nPlanes))
    val scored = q.join(c, Seq("bucket")).where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }
}
