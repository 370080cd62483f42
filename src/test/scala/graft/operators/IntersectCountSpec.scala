package graft.operators

import graft.SparkSpec
import graft.functions.ShingleFunctions
import org.apache.spark.sql.functions._

/** The optimization round swapped every dedup verify stage's
  * `size(array_intersect(a, b))` for the allocation-free
  * [[graft.functions.IntersectCountExpr]] kernel — this spec pins the
  * equivalence the swap relies on, including the cases the production
  * arrays never hit (duplicates, empties, disjoint/identical extremes),
  * in both codegen and interpreted evaluation.
  */
class IntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private def check(rows: Seq[(Seq[Long], Seq[Long])]): Unit = {
    val df = rows.toDF("a", "b")
    val got = df.select(
        ShingleFunctions.intersectCount(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"kernel ${r.getInt(0)} != array_intersect ${r.getInt(1)}"))
  }

  test("matches size(array_intersect) on hand-picked cases") {
    check(Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(1L), Seq.empty[Long]),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(5L, 5L, 5L), Seq(5L)),          // duplicates in a count ONCE
      (Seq(5L), Seq(5L, 5L, 5L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),      // disjoint
      (Seq(1L, 2L, 3L), Seq(3L, 2L, 1L)),  // identical as sets
      (Seq(0L, -1L, Long.MinValue, Long.MaxValue),
        Seq(Long.MaxValue, 0L, 7L)),        // sentinel-ish values (0, extremes)
      (Seq(0L, 0L), Seq(0L))))
  }

  test("matches size(array_intersect) with NULL elements (parquet round-trip arrays)") {
    // persisted index tables read hash arrays back containsNull=true — the
    // kernel must implement array_intersect's NULL rule, not assume null-free
    val rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq[java.lang.Long](1L, null, 2L), Seq[java.lang.Long](null, 2L)),
      (Seq[java.lang.Long](null, null), Seq[java.lang.Long](null)),
      (Seq[java.lang.Long](null), Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](null, 1L)))
    val df = rows.toDF("a", "b")
    val got = df.select(
        ShingleFunctions.intersectCount(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"kernel ${r.getInt(0)} != array_intersect ${r.getInt(1)}"))
  }

  test("matches size(array_intersect) on seeded random multisets") {
    val rnd = new scala.util.Random(1234)
    val rows = (1 to 200).map { _ =>
      val na = rnd.nextInt(300)
      val nb = rnd.nextInt(300)
      // narrow value domain forces collisions, duplicates and near-identity
      (Seq.fill(na)(rnd.nextInt(200).toLong), Seq.fill(nb)(rnd.nextInt(200).toLong))
    }
    check(rows)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(99)
    (1 to 50).foreach { _ =>
      val a = Array.fill(rnd.nextInt(100))(rnd.nextInt(64).toLong)
      val b = Array.fill(rnd.nextInt(100))(rnd.nextInt(64).toLong)
      val expect = a.distinct.count(b.contains)
      val got = graft.functions.ShingleHash.intersectCount(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      assert(got == expect, s"kernel $got != scala $expect")
    }
  }
}
