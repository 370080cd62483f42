package graft.operators

import graft.SparkSpec
import graft.functions.EwmaFold
import org.apache.spark.sql.functions._

/** Pins the r18 ewma codegen kernel to the catalyst higher-order fold it
  * replaced: bit-identical doubles on random frames (the a14 bit-stability
  * contract — the oracle left-folds the same sequence).
  */
class EwmaFoldSpec extends SparkSpec {
  import spark.implicits._

  private def oldFold(arr: org.apache.spark.sql.Column, alpha: Double, lookback: Int) =
    aggregate(slice(arr, lit(2), lit(lookback)), get(arr, lit(0)),
      (acc, x) => acc * lit(1.0 - alpha) + x * lit(alpha))

  test("ewma_fold is bit-identical to the interpreted aggregate() fold") {
    val rnd = new scala.util.Random(42424242L)
    // lengths 1..40 straddle the lookback (32): the slice cap must match
    val rows = (1 to 300).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(rnd.nextDouble() * 2000 - 1000))
    }
    for (alpha <- Seq(0.5, 0.25, 0.9); lookback <- Seq(1, 2, 32)) {
      val df = rows.toDF("id", "arr")
        .select(col("id"),
          EwmaFold.ewmaFold(col("arr"), alpha, lookback).as("kernel"),
          oldFold(col("arr"), alpha, lookback).as("hof"))
      val bad = df.where(col("kernel") =!= col("hof")).count()
      assert(bad == 0L, s"alpha=$alpha lookback=$lookback: $bad rows differ bit-wise")
    }
  }

  test("ewma operator output is unchanged by the kernel swap (golden values)") {
    // hand-checked recurrence: v = 1, 2, 3 with alpha 0.5:
    // e1 = 1; e2 = 1*0.5 + 2*0.5 = 1.5; e3 = 1.5*0.5 + 3*0.5 = 2.25
    val df = Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 3.0))
      .toDF("g", "t", "tb", "v")
    val got = TimeSeries.ewma(df, "t", "g", "v", "tb", alpha = 0.5, lookback = 32)
      .orderBy("t").select("ewma").as[Double].collect().toSeq
    assert(got == Seq(1.0, 1.5, 2.25), got.toString)
  }

  test("ewma_fold NULL input yields NULL; type errors are loud") {
    val df = Seq(Tuple1(Option.empty[Seq[Double]])).toDF("arr")
      .select(EwmaFold.ewmaFold(col("arr"), 0.5, 32).as("e"))
    assert(df.collect().head.isNullAt(0))
    intercept[Exception] {
      Seq(Tuple1("nope")).toDF("arr")
        .select(EwmaFold.ewmaFold(col("arr"), 0.5, 32)).collect()
    }
  }
}
