package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benchmark decontamination (Dedup.decontaminate): exact n-gram overlap
  * semantics, the short-doc whole-token-list rule, distinct-hit counting,
  * and the scale-shape pin (benchmark side broadcasts; the corpus never
  * shuffles before the matched-rows aggregate).
  */
class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b c d e f"),     // contains bench 3-grams "b c d", "c d e"
    (2L, "x y z a b"),       // contains "x y z"
    (3L, "q r s t u"),       // clean
    (4L, "a b"),             // short doc: whole-list gram "a b"
    (5L, "b c d c d e b c d") // repeated grams: n_hits counts DISTINCT
  ).toDF("doc_id", "text")

  private val bench = Seq(
    (100L, "b c d e"),       // grams: "b c d", "c d e"
    (101L, "x y z"),         // exactly one 3-gram
    (102L, "a b")            // short benchmark doc: whole-list gram
  ).toDF("doc_id", "text")

  test("exact n-gram hits, short-doc rule, distinct counting") {
    val got = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1: hits "b c d" + "c d e" → 2; doc 2: "x y z" → 1;
    // doc 4: its whole-list gram "a b" matches bench doc 102's → 1;
    // doc 5: "b c d" and "c d e" present (repeats collapse) → 2
    assert(got == Seq((1L, 2L), (2L, 1L), (4L, 1L), (5L, 2L)))
  }

  test("clean corpus → empty result; empty/whitespace texts never match") {
    val clean = Seq((9L, "p q r s"), (10L, ""), (11L, "   ")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(clean, bench, "doc_id", "text", n = 3).count() == 0L)
  }

  test("scale shape: the benchmark gram set broadcasts; no corpus-sized exchange") {
    // pre-split input: the at-scale shape this pin asserts (a well-split
    // corpus makes the r17 Spread guard a no-op, like any real corpus scan)
    val plan = Dedup.decontaminate(wellSplit(corpus), wellSplit(bench), "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    // the benchmark gram set broadcasts — the corpus side never takes part
    // in a shuffle JOIN
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle into a join:\n$plan")
    // allowed exchanges, all SMALL: the benchmark distinct (benchmark-
    // sized) and countDistinct's two-phase (id,h)→(id) pair over MATCHED
    // rows only — each preceded by a map-side partial dedup, so nothing
    // corpus-sized ever crosses the wire
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 3, s"unexpected extra exchange:\n$plan")
  }
}
