package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TimeSeries.ewmaLast]] — the secondary-sort recurrence fold:
  * agreement with a sequential reference (bit-exact), group boundary
  * handling (a group's first row must fold exactly once), layout
  * invariance, and loud contract failures. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val data = for (u <- 0L until 40L; i <- 0 until (u % 7 + 1).toInt)
    yield (u, i.toLong, (u * 31 + i * 17 % 13).toDouble / 4.0)

  private def reference(alpha: Double): Map[Long, (Long, Double)] =
    data.groupBy(_._1).map { case (u, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      u -> (xs.size.toLong, xs.tail.foldLeft(xs.head)((e, x) => e + (x - e) * alpha))
    }

  private def run(parts: Int): Map[Long, (Long, Double)] =
    TimeSeries.ewmaLast(data.toDF("u", "i", "x").repartition(parts),
        Seq("u"), Seq("i"), "x", 0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("fold matches the sequential reference bit-for-bit, single-point groups included") {
    val got = run(8)
    val want = reference(0.25)
    assert(got.keySet == want.keySet)
    got.foreach { case (u, (n, e)) =>
      assert(n == want(u)._1, s"user $u: n_points $n vs ${want(u)._1}")
      assert(java.lang.Double.doubleToRawLongBits(e) ==
        java.lang.Double.doubleToRawLongBits(want(u)._2),
        s"user $u: ewma bits diverged ($e vs ${want(u)._2})")
    }
  }

  test("group boundaries fold each first row exactly once (regression: double-init)") {
    // many adjacent 1-row and 2-row groups in one sorted partition —
    // the shape where a boundary bug double-counts first rows
    val tiny = (0L until 30L).flatMap(u =>
      (0 until (u % 2 + 1).toInt).map(i => (u, i.toLong, 10.0 + u)))
    val got = TimeSeries
      .ewmaLast(tiny.toDF("u", "i", "x").repartition(1), Seq("u"),
        Seq("i"), "x", 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 30L).foreach(u =>
      assert(got(u) == u % 2 + 1, s"user $u counted ${got(u)} points"))
  }

  test("result is identical under any input partitioning") {
    assert(run(1) == run(17), "fold moved with partition count")
  }

  test("contract violations are loud: null values, non-binary alpha") {
    val withNull = Seq((1L, 0L, Some(1.0)), (1L, 1L, None))
      .toDF("u", "i", "x")
    val e = intercept[org.apache.spark.SparkException] {
      TimeSeries.ewmaLast(withNull, Seq("u"), Seq("i"), "x", 0.25).collect()
    }
    assert(e.getCause.getMessage.contains("null value"))
    val bad = intercept[IllegalArgumentException] {
      TimeSeries.ewmaLast(withNull.na.drop(), Seq("u"), Seq("i"), "x", 0.3)
    }
    assert(bad.getMessage.contains("binary fraction"))
  }
}
