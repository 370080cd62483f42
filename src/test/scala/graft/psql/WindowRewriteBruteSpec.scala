package graft.psql

import graft.SparkSpec

/** Brute-force differential test for the window rewrite family
  * (EXCLUDE / FILTER / DISTINCT): random small datasets WITH NULLS and
  * random frame bounds, compared against a direct Scala evaluation of the
  * SQL-standard semantics. The cross-engine fuzzer covers the shapes
  * DuckDB can run; this spec covers what it cannot — null-heavy inputs
  * against an independent oracle, including the empty-frame and
  * all-excluded edges the subtractive formulas guard with count
  * arithmetic.
  */
class WindowRewriteBruteSpec extends SparkSpec {

  lazy val psql = Psql(spark)

  private case class R(id: Int, g: String, k: Int, x: Option[Int])

  private def mkView(rows: Seq[R], name: String): Unit = {
    import spark.implicits._
    rows.map(r => (r.id, r.g, r.k, r.x.map(Integer.valueOf).orNull))
      .toDF("id", "g", "k", "x")
      .selectExpr("id", "g", "k", "cast(x as int) as x")
      .createOrReplaceTempView(name)
  }

  /** Frame rows for ROWS BETWEEN a PRECEDING AND b FOLLOWING around index
    * i of `part` (sorted), minus the exclusion.
    */
  private def rowsFrame(part: IndexedSeq[R], i: Int, a: Int, b: Int,
      exclude: String): Seq[R] = {
    val lo = math.max(0, i - a)
    val hi = math.min(part.size - 1, i + b)
    val frame = (lo to hi).map(part)
    exclude match {
      case "current row" => frame.filterNot(_.id == part(i).id)
      case "no others"   => frame
    }
  }

  /** RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW over order key k,
    * minus GROUP/TIES exclusion (peers = equal k).
    */
  private def rangeFrame(part: Seq[R], cur: R, exclude: String): Seq[R] = {
    val frame = part.filter(_.k <= cur.k)
    exclude match {
      case "group" => frame.filterNot(_.k == cur.k)
      case "ties"  => frame.filterNot(r => r.k == cur.k && r.id != cur.id)
      case ""      => frame
    }
  }

  private def sumOpt(vs: Seq[Int]): Option[Long] =
    if (vs.isEmpty) None else Some(vs.map(_.toLong).sum)

  test("EXCLUDE CURRENT ROW over random ROWS frames with NULLs: sum/count/avg/min/max vs brute force") {
    val rnd = new scala.util.Random(1311)
    for (iter <- 1 to 12) {
      val n = 4 + rnd.nextInt(12)
      val rows = (1 to n).map { i =>
        R(i, if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(4),
          if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(50)))
      }
      mkView(rows, "brt")
      val a = rnd.nextInt(4)
      val b = rnd.nextInt(4)
      val frame = s"rows between $a preceding and $b following exclude current row"
      val got = psql.sql(s"""from brt |>
        |select id,
        |  sum(x) over (partition by g order by id $frame) as s,
        |  count(x) over (partition by g order by id $frame) as c,
        |  avg(x) over (partition by g order by id $frame) as m,
        |  min(x) over (partition by g order by id $frame) as mn,
        |  max(x) over (partition by g order by id $frame) as mx |>
        |order by id""".stripMargin).collect()
      val byG = rows.groupBy(_.g).map { case (g, rs) => g -> rs.sortBy(_.id).toIndexedSeq }
      for (r <- got) {
        val id = r.getInt(0)
        val cur = rows.find(_.id == id).get
        val part = byG(cur.g)
        val i = part.indexWhere(_.id == id)
        val vs = rowsFrame(part, i, a, b, "current row").flatMap(_.x)
        val ctx = s"iter=$iter id=$id frame=[$a,$b] vs=$vs"
        assert((if (r.isNullAt(1)) None else Some(r.getLong(1))) == sumOpt(vs), s"sum $ctx")
        assert(r.getLong(2) == vs.size, s"count $ctx")
        val expAvg = if (vs.isEmpty) None else Some(vs.map(_.toDouble).sum / vs.size)
        val gotAvg = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        assert((gotAvg.isEmpty && expAvg.isEmpty) ||
          math.abs(gotAvg.get - expAvg.get) < 1e-9, s"avg $ctx got=$gotAvg exp=$expAvg")
        assert((if (r.isNullAt(4)) None else Some(r.getInt(4))) == vs.reduceOption(_ min _), s"min $ctx")
        assert((if (r.isNullAt(5)) None else Some(r.getInt(5))) == vs.reduceOption(_ max _), s"max $ctx")
      }
    }
  }

  test("EXCLUDE GROUP/TIES over RANGE frames with NULLs vs brute force") {
    val rnd = new scala.util.Random(2311)
    for (iter <- 1 to 12) {
      val n = 4 + rnd.nextInt(12)
      val rows = (1 to n).map { i =>
        R(i, if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(3),
          if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(50)))
      }
      mkView(rows, "brt2")
      for (ex <- Seq("group", "ties")) {
        val frame = s"range between unbounded preceding and current row exclude $ex"
        val got = psql.sql(s"""from brt2 |>
          |select id,
          |  sum(x) over (partition by g order by k $frame) as s,
          |  count(x) over (partition by g order by k $frame) as c |>
          |order by id""".stripMargin).collect()
        val byG = rows.groupBy(_.g)
        for (r <- got) {
          val id = r.getInt(0)
          val cur = rows.find(_.id == id).get
          val vs = rangeFrame(byG(cur.g), cur, ex).flatMap(_.x)
          val ctx = s"iter=$iter id=$id ex=$ex vs=$vs"
          assert((if (r.isNullAt(1)) None else Some(r.getLong(1))) == sumOpt(vs), s"sum $ctx")
          assert(r.getLong(2) == vs.size, s"count $ctx")
        }
      }
    }
  }

  test("window FILTER and count(DISTINCT) with NULLs vs brute force") {
    val rnd = new scala.util.Random(3311)
    for (iter <- 1 to 12) {
      val n = 4 + rnd.nextInt(12)
      val rows = (1 to n).map { i =>
        R(i, if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(3),
          if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(6)))
      }
      mkView(rows, "brt3")
      val t = rnd.nextInt(5)
      val got = psql.sql(s"""from brt3 |>
        |select id,
        |  sum(x) filter (where x > $t) over (partition by g order by id
        |    rows between unbounded preceding and current row) as sf,
        |  count(distinct x) over (partition by g) as cd,
        |  count(distinct x) filter (where x > $t) over (partition by g) as cdf |>
        |order by id""".stripMargin).collect()
      val byG = rows.groupBy(_.g).map { case (g, rs) => g -> rs.sortBy(_.id) }
      for (r <- got) {
        val id = r.getInt(0)
        val cur = rows.find(_.id == id).get
        val part = byG(cur.g)
        val pre = part.takeWhile(_.id <= id)
        val fvs = pre.flatMap(_.x).filter(_ > t)
        val ctx = s"iter=$iter id=$id t=$t"
        assert((if (r.isNullAt(1)) None else Some(r.getLong(1))) == sumOpt(fvs), s"sf $ctx")
        assert(r.getLong(2) == part.flatMap(_.x).distinct.size, s"cd $ctx")
        assert(r.getLong(3) == part.flatMap(_.x).filter(_ > t).distinct.size, s"cdf $ctx")
      }
    }
  }
}
