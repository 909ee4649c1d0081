package graft

import graft.operators.{Dedup, Graph, Memos}

/** Memo registry contract (advice r7): memoized frames are reused
  * within a session (same checkpointed plan instance), and clearAll
  * drops the references so a long-running multi-tenant session can
  * release the per-dir checkpoint blocks. */
class MemoSpec extends SparkSpecBase {

  test("memoized frames are reused until clearAll, then recompute") {
    val a = Dedup.exactPairs(spark, sf)
    val b = Dedup.exactPairs(spark, sf)
    assert(a eq b) // same checkpointed instance — no recomputation
    val g1 = Graph.lpa25(spark, sf)
    Memos.clearAll()
    val c = Dedup.exactPairs(spark, sf)
    assert(!(a eq c), "cleared memo must rebuild a fresh frame")
    val g2 = Graph.lpa25(spark, sf)
    assert(!(g1 eq g2))
    // and the rebuilt frames carry identical results
    assert(c.collect().map(_.toString).sorted
      .sameElements(a.collect().map(_.toString).sorted))
  }
}
