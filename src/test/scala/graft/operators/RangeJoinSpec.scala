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

  test("interval overlap: closed-interval semantics, canonical-bin dedup") {
    import spark.implicits._
    val left = Seq(
      (1L, 0L, 100L, 10L),   // spans many width-10 bins
      (1L, 50L, 60L, 11L),
      (2L, 0L, 5L, 12L)      // other key
    ).toDF("k", "llo", "lhi", "lid")
    val right = Seq(
      (1L, 90L, 200L, 20L),  // overlaps [0,100] in [90,100]
      (1L, 100L, 110L, 21L), // TOUCHES [0,100] at exactly 100 (closed)
      (1L, 101L, 110L, 22L), // just misses
      (1L, 55L, 58L, 23L),   // nested inside [50,60] and [0,100]
      (2L, 5L, 9L, 24L)      // touches [0,5] at 5 on the other key
    ).toDF("k", "rlo", "rhi", "rid")
    val out = RangeJoin.intervalOverlap(left, "llo", "lhi",
        right, "rlo", "rhi", keys = Seq("k"), binWidth = 10L)
    val pairs = out.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set(
      (10L, 20L), (10L, 21L), (10L, 23L), (11L, 23L), (12L, 24L)),
      s"got ${pairs.toSet}")
    // the canonical-bin rule keeps exactly ONE copy of each pair even
    // though wide intersections cover many bins
    assert(pairs.length == pairs.toSet.size,
      s"duplicate pair rows: ${pairs.length} vs ${pairs.toSet.size}")
  }

  test("differential: both range joins agree with brute-force filters") {
    import spark.implicits._
    def h(i: Long, salt: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$salt|$i".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
    val points = (0L until 300L)
      .map(i => (h(i, "pk") % 5, h(i, "pp") % 500, i))
      .toDF("k", "p", "pid")
    val ints = (0L until 200L).map { i =>
      val lo = h(i, "il") % 500
      (h(i, "ik") % 5, lo, lo + h(i, "iw") % 60, i)
    }.toDF("k", "lo", "hi", "iid")

    val gotP = RangeJoin.pointInInterval(points, "p", ints, "lo", "hi",
        Seq("k"), binWidth = 32L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expP = points.as("a").crossJoin(ints.as("b"))
      .filter(col("a.k") === col("b.k") &&
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gotP.length == gotP.toSet.size, "point form emitted dups")
    assert(gotP.toSet == expP.toSet,
      s"point form diverged: ${(gotP.toSet -- expP.toSet).take(3)} / " +
        s"${(expP.toSet -- gotP.toSet).take(3)}")

    val ints2 = (0L until 150L).map { i =>
      val lo = h(i, "jl") % 500
      (h(i, "jk") % 5, lo, lo + h(i, "jw") % 90, i)
    }.toDF("k", "lo2", "hi2", "jid")
    val gotO = RangeJoin.intervalOverlap(ints, "lo", "hi",
        ints2, "lo2", "hi2", Seq("k"), binWidth = 32L)
      .select("iid", "jid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expO = ints.as("a").crossJoin(ints2.as("b"))
      .filter(col("a.k") === col("b.k") &&
        col("lo") <= col("hi2") && col("lo2") <= col("hi"))
      .select("iid", "jid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gotO.length == gotO.toSet.size, "overlap form emitted dups")
    assert(gotO.toSet == expO.toSet,
      s"overlap form diverged: ${(gotO.toSet -- expO.toSet).take(3)} / " +
        s"${(expO.toSet -- gotO.toSet).take(3)}")
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
