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

  test("digest: identical corpora agree; any single-row change flips the group digest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws}
    def d(rows: Seq[(String, Long, String)]) =
      SnapshotDiff.digest(rows.toDF("g", "id", "t"), Seq("g"),
          concat_ws("|", col("id"), col("t")))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val base = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("b", 3L, "z"))
    assert(d(base) == d(base.reverse)) // order-free
    val mutated = Seq(("a", 1L, "x"), ("a", 2L, "Y"), ("b", 3L, "z"))
    val (db, dm) = (d(base), d(mutated))
    assert(db("a") != dm("a"), "changed row must flip its group digest")
    assert(db("b") == dm("b"), "untouched group must keep its digest")
  }

  test("digest: xor merge law for disjoint halves, and the duplicate-pair blind spot is covered") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws}
    val left = (0L until 50L).map(i => ("g", i, s"t$i"))
    val right = (50L until 90L).map(i => ("g", i, s"t$i"))
    def dig(rows: Seq[(String, Long, String)]) =
      SnapshotDiff.digest(rows.toDF("g", "id", "t"), Seq("g"),
          concat_ws("|", col("id"), col("t")))
        .collect().head
    val (dl, dr, du) = (dig(left), dig(right), dig(left ++ right))
    assert((dl.getLong(2) ^ dr.getLong(2)) == du.getLong(2),
      "xor digests of disjoint halves must merge to the union's")
    assert(dl.getLong(3) + dr.getLong(3) == du.getLong(3))
    // a row duplicated an EVEN number of times cancels in xor — count
    // and sum still move, so the divergence is caught
    val dup = dig(left ++ Seq(left.head, left.head))
    assert(dup.getLong(2) == dl.getLong(2), "xor alone is blind here")
    assert(dup.getLong(1) != dl.getLong(1) &&
      dup.getLong(3) != dl.getLong(3),
      "count+sum must catch the even-duplication xor blind spot")
  }
}
