package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChatFunctionsSpec extends SparkSpec {
  import ChatFunctions._

  test("userHistoryText keeps user turns in order, drops assistant turns") {
    import spark.implicits._
    val msgs = Seq(
      (3, "user", "third"), (1, "user", "first"),
      (2, "assistant", "noise"), (4, "user", "fourth"))
      .toDF("seq", "role", "content")
    val out = msgs.agg(
      userHistoryText(col("role"), col("content"), col("seq")))
      .head.getString(0)
    assert(out == "first\nthird\nfourth")
  }

  test("truncateHistory keeps the last n (all when fewer)") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c", "d"), Seq("x"))).toDF("long", "short")
    val r = df.select(
      truncateHistory(col("long"), 3), truncateHistory(col("short"), 3))
      .head()
    assert(r.getSeq[String](0) == Seq("b", "c", "d"))
    assert(r.getSeq[String](1) == Seq("x"))
  }

  test("stripAtMarker cuts at the first marker occurrence") {
    import spark.implicits._
    val r = Seq("answer text\n\nREFS: [1] a [2] b", "no marker here")
      .toDF("c")
      .select(stripAtMarker(col("c"), "\n\nREFS:"))
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("answer text", "no marker here"))
  }

  test("validateComponents dedups in order, filters, appends default") {
    import spark.implicits._
    val df = Seq(
      (Seq("zh", "bogus", "zh", "en"), Seq("zh", "en")),
      (Seq("bogus", "nope"), Seq("en")),
      (Seq("es", "fr"), Seq("es", "fr", "en")))
      .toDF("req", "expected")
    val bad = df.filter(
      validateComponents(col("req"), Seq("en", "zh", "es", "fr", "de"),
        "en") =!= col("expected")).count()
    assert(bad == 0)
  }
}
