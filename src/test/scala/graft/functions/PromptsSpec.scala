package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PromptsSpec extends SparkSpec {

  test("render fills named placeholders from columns, leaves unknown intact") {
    import spark.implicits._
    val out = Seq(("2026-08-12", "ctx A"))
      .toDF("today", "snippets")
      .select(Prompts.render(
        "Today is {today}. Context:\n{snippets}\nUnknown: {nope}",
        Seq("today" -> col("today"), "snippets" -> col("snippets"))))
      .head.getString(0)
    assert(out == "Today is 2026-08-12. Context:\nctx A\nUnknown: {nope}")
  }

  test("render casts non-string bindings") {
    import spark.implicits._
    val out = Seq(Tuple1(7)).toDF("k")
      .select(Prompts.render("top-{k} results", Seq("k" -> col("k"))))
      .head.getString(0)
    assert(out == "top-7 results")
  }
}
