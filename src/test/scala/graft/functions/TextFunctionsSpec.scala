package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

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
