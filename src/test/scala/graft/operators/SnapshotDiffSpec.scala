package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SnapshotDiff.diff]] — presence is tracked by marker columns, not
  * fingerprint nullness, so null-content rows classify correctly; the
  * q118 gate then checks the same logic cross-engine. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val oldRows = Seq(
    (1L, "same"), (2L, "was-this"), (3L, "gone"), (5L, null)
  ).toDF("id", "text")
  private val newRows = Seq(
    (1L, "same"), (2L, "now-this"), (4L, "fresh"), (5L, null)
  ).toDF("id", "text")

  test("classifies added / removed / changed / unchanged in one pass") {
    val got = SnapshotDiff
      .diff(oldRows, newRows, Seq("id"), md5(coalesce(col("text"), lit(""))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"), got.toString)
  }

  test("a null fingerprint still reads as present: null-text row is not added+removed") {
    // fingerprint passed RAW (no coalesce): md5(null) = null on id=5,
    // which must classify via the marker columns as unchanged
    // (null <=> null), never as a missing row
    val got = SnapshotDiff.diff(oldRows, newRows, Seq("id"), md5(col("text")))
      .filter(col("id") === 5L).collect()
    assert(got.length == 1 && got.head.getString(1) == "unchanged",
      got.mkString(","))
  }

  test("composite keys and layout invariance") {
    val o = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("b", 1L, "z"))
      .toDF("part", "id", "text")
    val n = Seq(("a", 1L, "x"), ("a", 2L, "Y"), ("b", 2L, "w"))
      .toDF("part", "id", "text")
    def run(parts: Int) = SnapshotDiff
      .diff(o.repartition(parts), n.repartition(parts),
        Seq("part", "id"), md5(col("text")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2))
      .toMap
    val want = Map(("a", 1L) -> "unchanged", ("a", 2L) -> "changed",
      ("b", 1L) -> "removed", ("b", 2L) -> "added")
    assert(run(1) == want && run(11) == want)
  }
}
