package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Z-order clustering (ZOrder.scala): curve math, layout-only contract,
  * and the data-skipping property the layout exists for — a box predicate
  * on either key overlaps FEW files' min/max ranges, where a hash layout
  * overlaps nearly all of them. Cross-engine curve parity is gate row b07.
  */
class ZOrderSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.register(spark, "/root/testdata/sf0.001")
  }

  test("zValue interleaves bits (column 0 most significant per round)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 8))
    val rows = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 2L) // x bit 0 sits at z bit 1
    assert(rows((0L, 1L)) == 1L) // y bit 0 sits at z bit 0
    // 3=0b11, 5=0b101 → z = interleave(x=011, y=101) = 0b011011... compute:
    // bit i of x at 2i+1, bit i of y at 2i: y0=1→1, x0=1→2, y1=0, x1=1→8,
    // y2=1→16, x2=0 → 1+2+8+16 = 27
    assert(rows((3L, 5L)) == 27L)
    assert(rows((255L, 255L)) == 65535L)
    // the SQL fragment evaluates to the same curve (Spark side; DuckDB
    // side is the b07 gate hash)
    val viaSql = Seq((3L, 5L)).toDF("x", "y")
      .selectExpr(ZOrder.zValueSql(Seq("x", "y"), 8) + " AS z")
      .collect()(0).getLong(0)
    assert(viaSql == 27L)
    // NULL input → NULL z (rows with NULL keys cluster at layout end)
    val zn = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 8))
      .collect()(0)
    assert(zn.isNullAt(2))
  }

  test("zValue guards its bit budget") {
    val e = intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("a"), col("b")), 32)
    }
    assert(e.getMessage.contains("1..62"), e.getMessage)
  }

  test("writeZOrdered: content preserved; box query overlaps few files (hash layout: nearly all)") {
    val src = spark.table("events")
      .select(col("event_id"), col("user_id"),
        pmod(col("user_id"), lit(64)).cast("bigint").as("uk"),
        pmod(col("event_id"), lit(64)).cast("bigint").as("tk"))
    val out = ZOrder.writeZOrdered(spark, src, "graft_test_zorder",
      Seq("uk", "tk"), bits = 6, files = 16)
    // layout-only: exact content round-trip
    assert(out.count() == src.count())
    assert(out.exceptAll(src).isEmpty && src.exceptAll(out).isEmpty)
    // per-file [min,max] of BOTH keys; a 16x16 box (uk<16 AND tk<16 = 1/16
    // of the 64x64 key space) must overlap few files' ranges — that range
    // disjointness is exactly what parquet row-group stats skip on
    def overlapping(table: String): Long = spark.table(table)
      .select(input_file_name().as("f"), col("uk"), col("tk"))
      .groupBy("f")
      .agg(min("uk").as("ulo"), max("uk").as("uhi"),
        min("tk").as("tlo"), max("tk").as("thi"))
      .where(col("ulo") < 16 && col("tlo") < 16)
      .count()
    val nFiles = spark.table("graft_test_zorder")
      .select(input_file_name()).distinct().count()
    assert(nFiles >= 8, s"want a multi-file layout, got $nFiles")
    // bound is loose-ish (≤6, not the ideal ~2): repartitionByRange samples
    // its boundaries, so file cuts don't align to z-block edges exactly
    val zHit = overlapping("graft_test_zorder")
    assert(zHit <= 6, s"z-order box should touch <=6 of $nFiles files, touched $zHit")
    // control: the same data in a hash layout — (almost) every file's
    // range covers the box, so stats skip nothing
    Bucketing.dropTableAndLocation(spark, "graft_test_zorder_hash")
    src.repartition(16, col("event_id"))
      .write.format("parquet").saveAsTable("graft_test_zorder_hash")
    val hashHit = overlapping("graft_test_zorder_hash")
    assert(hashHit >= 12, s"hash layout should touch nearly all 16 files, touched $hashHit")
  }
}
