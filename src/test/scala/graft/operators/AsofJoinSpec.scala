package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(1704067200000L +
    min * 60000)

  test("backward as-of: latest at-or-before match, inclusive, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), 100L), // after both right rows for key 1
      (1L, ts(4), 101L),  // between: matches the ts(3) row
      (1L, ts(2), 102L),  // before everything: unmatched
      (2L, ts(5), 103L),  // exactly AT a right ts: inclusive match
      (3L, ts(9), 104L)   // key with no right rows at all
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(3), 1L, 30.0),
      (1L, ts(7), 2L, 70.0),
      (2L, ts(5), 3L, 50.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsofJoin.backward(left, right, "user_id", "ts",
        Seq("value"), "event_id")
      .collect().map(r => r.getLong(2) ->
        Option(r.getAs[Any]("asof_value"))).toMap
    assert(out(100L) == Some(70.0)) // latest preceding
    assert(out(101L) == Some(30.0)) // skips the later row
    assert(out(102L) == None)       // nothing precedes
    assert(out(103L) == Some(50.0)) // equal ts matches (inclusive)
    assert(out(104L) == None)       // empty right group
    // left columns pass through untouched
    val cols = AsofJoin.backward(left, right, "user_id", "ts",
      Seq("value"), "event_id").columns.toSeq
    assert(cols == Seq("user_id", "ts", "event_id", "asof_value"))
  }

  test("ties on (key, ts) resolve to the greatest tiebreak; null-safe") {
    import spark.implicits._
    val left = Seq((1L, ts(6), 200L), (1L, ts(5), 201L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(5), 1L, 11.0), // same instant, lower event_id
      (1L, ts(5), 9L, 99.0)  // same instant, higher event_id -> wins
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsofJoin.backward(left, right, "user_id", "ts",
        Seq("value"), "event_id")
      .collect().map(r => r.getLong(2) -> r.getAs[Double]("asof_value"))
      .toMap
    assert(out(200L) == 99.0 && out(201L) == 99.0,
      s"tie must resolve to the max-tiebreak right row: $out")
    // null key / null ts LEFT rows survive unmatched (left-join
    // contract); null-key right rows are dropped (can't be a match)
    val leftN = Seq((Option.empty[Long], Option(ts(6)), 300L),
        (Option(1L), Option.empty[Timestamp], 301L))
      .toDF("user_id", "ts", "event_id")
    val outN = AsofJoin.backward(leftN, right, "user_id", "ts",
        Seq("value"), "event_id")
      .collect().map(r => r.getLong(2) ->
        Option(r.getAs[Any]("asof_value"))).toMap
    assert(outN == Map(300L -> None, 301L -> None))
  }

  test("differential: carry pass agrees with a window-function reference") {
    // independent formulation of the same semantics: union both sides,
    // last(rv) IGNORE NULLS over (key ORDER BY ts, side, tb) — the
    // declarative (buffer-paying) form the carry pass optimizes away.
    // Deterministic pseudo-random data with repeated keys, repeated
    // timestamps, and same-instant left/right collisions.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def h(i: Long, salt: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$salt|$i".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
    val left = (0L until 400L)
      .map(i => (h(i, "lk") % 11, ts(h(i, "lt") % 97), i))
      .toDF("k", "ts", "lid")
    val right = (0L until 300L)
      .map(i => (h(i, "rk") % 11, ts(h(i, "rt") % 97), i, (i * 7 % 50).toDouble))
      .toDF("k", "ts", "rid", "value")

    val got = AsofJoin.backward(left, right, "k", "ts",
        Seq("value"), "rid")
      .select(col("lid"), col("asof_value"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[Any](1))).toMap

    val u = right.select(col("k"), col("ts"), lit(0).as("side"),
        col("rid").as("tb"), col("value").as("rv"),
        lit(null).cast("long").as("lid"))
      .unionByName(left.select(col("k"), col("ts"), lit(1).as("side"),
        lit(Long.MaxValue).as("tb"), lit(null).cast("double").as("rv"),
        col("lid")))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("side"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = u
      .withColumn("carry", last(col("rv"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("lid"), col("carry"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[Any](1))).toMap

    assert(got.size == 400 && got == expected,
      s"carry pass diverged from the window reference: " +
        s"${(got.toSet -- expected.toSet).take(5)} vs " +
        s"${(expected.toSet -- got.toSet).take(5)}")
  }

  test("plan shape: one exchange on the union, no join operator") {
    import spark.implicits._
    val left = (0L until 100L).map(i => (i % 7, ts(i), i))
      .toDF("user_id", "ts", "event_id")
    val right = (0L until 50L).map(i => (i % 7, ts(i * 2), i, i * 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val df = AsofJoin.backward(left, right, "user_id", "ts",
      Seq("value"), "event_id")
    val plan = df.queryExecution.executedPlan.toString
    // no join OPERATOR anywhere ("AsofJoin" itself appears in the
    // MapPartitions lambda name — match the physical operators)
    for (op <- Seq("SortMergeJoin", "BroadcastHashJoin",
        "ShuffledHashJoin", "CartesianProduct", "BroadcastNestedLoop"))
      assert(!plan.contains(op), s"as-of must not plan a $op:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"exactly one co-partitioning shuffle expected, got $exchanges:\n$plan")
  }

  test("forward as-of: earliest at-or-after match, inclusive, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(2), 100L),  // before both right rows: matches ts(3)
      (1L, ts(4), 101L),  // between: matches the ts(7) row
      (1L, ts(10), 102L), // after everything: unmatched
      (2L, ts(5), 103L),  // exactly AT a right ts: inclusive match
      (3L, ts(9), 104L)   // key with no right rows at all
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(3), 1L, 30.0),
      (1L, ts(7), 2L, 70.0),
      (2L, ts(5), 3L, 50.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsofJoin.forward(left, right, "user_id", "ts",
        Seq("value"), "event_id")
      .collect().map(r => r.getLong(2) ->
        Option(r.getAs[Any]("asof_value"))).toMap
    assert(out(100L) == Some(30.0)) // earliest following
    assert(out(101L) == Some(70.0))
    assert(out(102L) == None)       // nothing follows
    assert(out(103L) == Some(50.0)) // equal ts matches (inclusive)
    assert(out(104L) == None)
  }

  test("forward ties resolve to the greatest tiebreak; null left ts stays unmatched") {
    import spark.implicits._
    val left = Seq((1L, Some(ts(1)), 100L), (1L, None, 101L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(5), 1L, 10.0),
      (1L, ts(5), 2L, 20.0) // same (key, ts): greater event_id wins
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsofJoin.forward(left, right, "user_id", "ts",
        Seq("value"), "event_id")
      .collect().map(r => r.getLong(2) ->
        Option(r.getAs[Any]("asof_value"))).toMap
    assert(out(100L) == Some(20.0), s"tie must pick max tiebreak: $out")
    assert(out(101L) == None,
      "a null-ts left row must not inherit the forward carry")
  }

  test("forward differential: agrees with a window-function reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (0 until 200).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(100).toLong), i.toLong))
      .toDF("k", "ts", "lid")
    val right = (0 until 150).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(100).toLong), i.toLong,
        rnd.nextInt(1000).toDouble))
      .toDF("k", "ts", "rid", "v")
    val got = AsofJoin.forward(left, right, "k", "ts", Seq("v"), "rid")
      .collect().map(r => r.getLong(2) ->
        Option(r.getAs[Any]("asof_v"))).toMap
    // reference: per left row, min-ts right row at-or-after, max rid tie
    val rightRows = right.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    left.collect().foreach { lr =>
      val (k, t, lid) = (lr.getLong(0), lr.getTimestamp(1), lr.getLong(2))
      val cand = rightRows.filter(r => r._1 == k && !r._2.before(t))
      val want =
        if (cand.isEmpty) None
        else {
          val minTs = cand.map(_._2.getTime).min
          Some(cand.filter(_._2.getTime == minTs).maxBy(_._3)._4)
        }
      assert(got(lid) == want, s"lid=$lid: got ${got(lid)}, want $want")
    }
  }
}
