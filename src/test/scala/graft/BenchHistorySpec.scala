package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r14 best_known-poisoning fix: `_meta.best_known` (only emitted on
  * contended runs) must never let this run's inflated median REPLACE a
  * historical idle median — a contended host slows both the main pass and
  * the cost_changed confirmation retry alike, so two "agreeing" passes at
  * 4× the idle cost prove nothing (r14 stamped d05_ann_cosine_topk at
  * 2.437 s where its idle cost is 0.55 s).
  */
class BenchHistorySpec extends AnyFunSuite {

  test("a contended median never re-stamps over a lower historical idle median") {
    // the r14 d05 case: history 0.55 s idle, this (contended) run 2.44 s
    assert(Bench.bestKnownMedian(history = Some(0.55), median = 2.437) == 0.55)
  }

  test("a LOWER median than history still wins (contention only inflates)") {
    assert(Bench.bestKnownMedian(history = Some(0.90), median = 0.62) == 0.62)
  }

  test("a query with no history reports this run's median (new query)") {
    assert(Bench.bestKnownMedian(history = None, median = 1.54) == 1.54)
  }
}
