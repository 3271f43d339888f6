package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BatchRerankerSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("scores are deterministic, aligned, and null-safe") {
    import spark.implicits._
    val enc = FakeCrossEncoder(batchSize = 3)
    val in = Seq(
      (1L, "spark window table"), (2L, "nothing relevant"),
      (3L, null.asInstanceOf[String]), (4L, "spark spark spark"))
      .toDF("id", "text")
    val out = enc.scoreCandidates(in, "text", "spark table")
      .orderBy("id").collect()
    assert(out.length == 4)
    assert(out(2).isNullAt(2), "null text must yield null score")
    // full-overlap doc beats zero-overlap doc regardless of jitter
    assert(out(0).getDouble(2) > out(1).getDouble(2))
    // deterministic across invocations
    val again = enc.scoreCandidates(in, "text", "spark table")
      .orderBy("id").collect()
    out.zip(again).foreach { case (a, b) =>
      assert(a.isNullAt(2) == b.isNullAt(2))
      if (!a.isNullAt(2)) assert(a.getDouble(2) == b.getDouble(2))
    }
  }

  test("rerank keeps the top limit by score desc with deterministic ties") {
    val enc = FakeCrossEncoder()
    val top = enc.rerank(docs, "text", "spark query join", limit = 5,
      tieBreak = "doc_id")
    val rows = top.select("doc_id", "rerank_score").collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "must be score-descending")
  }

  test("scoring is a narrow transformation (no shuffle)") {
    val enc = FakeCrossEncoder()
    val plan = enc.scoreCandidates(docs, "text", "q")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("batching covers partitions larger than one batch") {
    val enc = FakeCrossEncoder(batchSize = 7)
    val n = enc.scoreCandidates(docs.repartition(2), "text", "query")
      .filter(col("rerank_score").isNotNull).count()
    assert(n == docs.filter(col("text").isNotNull).count())
  }
}
