package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  test("gopherSignals: each rule trips on its crafted document, " +
      "healthy prose keeps") {
    import spark.implicits._
    graft.plans.VectorExpressions.ensureRegistered(spark)
    // 60 words of plausible prose: mean word length in [3,10], all
    // alphabetic, two+ required stopwords — every rule passes
    val healthy = (("the quick brown fox jumps over another lazy dog " +
      "and that animal have fun with friends ") * 4).trim
    // rule-specific trip wires (each otherwise healthy)
    val short = "the cat and that dog have fun with food" // < 50 words
    val symbols = healthy + " " + Seq.fill(12)("###").mkString(" ")
    val bullets = (1 to 10).map(i =>
      s"- the item and that note have weight with value $i").mkString("\n")
    val ellipsis = (1 to 10).map(i =>
      s"the line and that thought have more with number $i ...")
      .mkString("\n")
    val numeric = healthy + " " + (1 to 60).map(_.toString).mkString(" ")
    val noStop = ("alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa ") * 6
    val df = Seq(
      (1L, healthy), (2L, short), (3L, symbols), (4L, bullets),
      (5L, ellipsis), (6L, numeric), (7L, noStop))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.gopherSignals(col("text")).as("g"))
      .select(col("doc_id"), col("g.*"))
    val rows = df.collect().map(r => r.getLong(0) ->
      r.getValuesMap[Any](df.columns.filter(_ != "doc_id"))).toMap
    assert(rows(1L)("keep") == 1L, s"healthy doc must keep: ${rows(1L)}")
    assert(rows(2L)("keep") == 0L && rows(2L)("word_count")
      .asInstanceOf[Long] < 50L)
    assert(rows(3L)("keep") == 0L && rows(3L)("symbol_count") == 36L)
    // 10 of 10 bullet lines > 90%
    assert(rows(4L)("keep") == 0L && rows(4L)("bullet_lines") == 10L &&
      rows(4L)("line_count") == 10L)
    // 10 of 10 ellipsis lines > 30%
    assert(rows(5L)("keep") == 0L && rows(5L)("ellipsis_lines") == 10L)
    // 60 of 132 words alphabetic < 80%
    assert(rows(6L)("keep") == 0L &&
      rows(6L)("alpha_words").asInstanceOf[Long] * 10L <
        rows(6L)("word_count").asInstanceOf[Long] * 8L)
    assert(rows(7L)("keep") == 0L && rows(7L)("stopword_hits") == 0L)
  }

  test("repetitionStats: duplicate lines, top-gram ties, edges") {
    import spark.implicits._
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val dupLines = "alpha beta\n\ngamma delta\nalpha beta\nepsilon"
    val gramTie = "b c a b c"  // "b c" twice; ties broken smallest key
    val boiler = Seq.fill(8)("click here to subscribe now").mkString("\n")
    val df = Seq(
      (1L, dupLines), (2L, gramTie), (3L, "single"), (4L, ""),
      (5L, boiler))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.*"),
        TextFunctions.repetitionKeep(col("r")).as("keep"))
    val rows = df.collect().map(r => r.getLong(0) ->
      r.getValuesMap[Any](df.columns.filter(_ != "doc_id"))).toMap
    // 4 non-empty lines (the blank excluded), "alpha beta" twice
    assert(rows(1L)("line_count") == 4L &&
      rows(1L)("dup_line_count") == 2L &&
      rows(1L)("dup_line_chars") == 20L)
    // top gram: "a b" and "c a" occur once, "b c" twice
    assert(rows(2L)("top_gram") == "b c" &&
      rows(2L)("top_gram_count") == 2L &&
      rows(2L)("top_gram_chars") == 4L)
    // tie at count 1 goes to the lexicographically smallest key
    assert(rows(3L)("top_gram") == null &&
      rows(3L)("top_gram_count") == 0L)
    assert(rows(4L)("line_count") == 0L && rows(4L)("word_chars") == 0L
      && rows(4L)("keep") == 1L)
    // 8 identical boilerplate lines: every repetition rule trips
    assert(rows(5L)("dup_line_count") == 8L && rows(5L)("keep") == 0L)
    assert(rows(1L)("keep") == 0L, "half the lines duplicated")
    assert(rows(2L)("keep") == 0L,
      "top gram covers 4 of 9 word chars > 18%")
    // null text propagates
    val n = Seq((9L, null: String)).toDF("doc_id", "text")
      .select(TextFunctions.repetitionStats(col("text")).as("r"))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("wordSpans: overlapping n-grams, short-doc empties, key width") {
    import spark.implicits._
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val rows = Seq(
      (1L, "a b c d"),     // 3 overlapping 2-grams
      (2L, "a  b"),        // run of spaces collapses
      (3L, "solo"),        // < n words -> empty, not null
      (4L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.wordSpans(col("text"), 2).as("sp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("a b", "b c", "c d"), rows(1L))
    assert(rows(2L) == Seq("a b"), rows(2L))
    assert(rows(3L) == Seq.empty, rows(3L))
    assert(rows(4L) == Seq.empty, rows(4L))
    // the shuffle key is 16 hex chars of the span's md5
    val k = Seq(("a b c")).toDF("t")
      .select(TextFunctions.spanKey(lit("a b")).as("k")).head.getString(0)
    assert(k.length == 16 && k.matches("[0-9a-f]{16}"), k)
    // null text yields null spans (tokens null-propagates)
    val n = Seq((9L, null: String)).toDF("doc_id", "text")
      .select(TextFunctions.wordSpans(col("text"), 2).as("sp")).head()
    assert(n.isNullAt(0))
  }

  test("redactPii: typed placeholders, pattern order, clean text " +
      "untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "write to alice.smith+x@sub.example.org today"),
      (2L, "server at 192.168.0.1 and id 123-45-6789"),
      (3L, "no pii here, just 1234 and a.b"),
      (4L, "two mails a@b.co c@d.io and ip 10.0.0.255"))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.redactPii(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "write to <EMAIL> today", rows(1L))
    assert(rows(2L) == "server at <IP> and id <SSN>", rows(2L))
    assert(rows(3L) == "no pii here, just 1234 and a.b", rows(3L))
    assert(rows(4L) == "two mails <EMAIL> <EMAIL> and ip <IP>", rows(4L))
    // null text stays null (regexp_replace null-propagates)
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(TextFunctions.redactPii(col("t")).as("r")).head()
    assert(n.isNullAt(0))
  }
}
