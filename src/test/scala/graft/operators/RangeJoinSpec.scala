package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  test("point-in-interval: boundaries inclusive, multi-bin, keyed") {
    import spark.implicits._
    val points = Seq(
      (1L, 10L, 100L), // inside [5, 15]
      (1L, 5L, 101L),  // ON the lower boundary
      (1L, 15L, 102L), // ON the upper boundary
      (1L, 16L, 103L), // just outside
      (2L, 10L, 104L), // right key range, wrong key
      (1L, 250L, 105L) // inside the wide interval [0, 300]
    ).toDF("k", "p", "pid")
    val intervals = Seq(
      (1L, 5L, 15L, 1L),
      (1L, 0L, 300L, 2L), // spans many width-10 bins
      (3L, 0L, 20L, 3L)   // key with no points
    ).toDF("k", "lo", "hi", "iid")
    val out = RangeJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", keys = Seq("k"), binWidth = 10L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(
      (100L, 1L), (101L, 1L), (102L, 1L), // [5,15] inclusive both ends
      (100L, 2L), (101L, 2L), (102L, 2L), (103L, 2L), (105L, 2L)),
      s"got $out")
    // each matching pair appears EXACTLY once (no cross-bin dup): the
    // set above has the same size as the raw collected array
    val n = RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", keys = Seq("k"), binWidth = 10L).count()
    assert(n == out.size, s"duplicate pair rows: $n vs ${out.size}")
  }

  test("plan: equi-join on (key, bin), never a nested loop") {
    import spark.implicits._
    val points = (0L until 500L).map(i => (i % 7, i, i)).toDF("k", "p", "pid")
    val intervals = (0L until 100L).map(i => (i % 7, i * 3, i * 3 + 40, i))
      .toDF("k", "lo", "hi", "iid")
    val plan = RangeJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", keys = Seq("k"), binWidth = 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"),
      s"range join degraded to a cross product:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on (key, bin):\n$plan")
  }
}
