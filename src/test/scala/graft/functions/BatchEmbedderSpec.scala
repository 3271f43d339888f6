package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BatchEmbedderSpec extends SparkSpec {

  private val embedder = FakeModelEmbedder(dim = 16, batchSize = 8)

  test("embedDocuments appends unit vectors, preserves rows and schema") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = embedder.embedDocuments(docs, "text").cache()
    assert(out.count() == docs.count())
    assert(out.columns.toSeq == docs.columns.toSeq :+ "embedding")
    val v = out.select("embedding").head().getSeq[Float](0)
    assert(v.length == 16)
    assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
  }

  test("same text embeds identically across partitions (determinism)") {
    import spark.implicits._
    val dup = Seq.fill(40)("repeated text for determinism").toDF("text")
      .repartition(7)
    val vecs = embedder.embedDocuments(dup, "text")
      .select("embedding").collect().map(_.getSeq[Float](0))
    assert(vecs.distinct.length == 1)
  }

  test("null text yields null vector; non-nulls keep their alignment") {
    import spark.implicits._
    val docs = Seq(Some("a"), None, Some("b"), None, Some("a"))
      .toDF("text")
    val out = embedder.embedDocuments(docs, "text")
      .select(col("text"), col("embedding")).collect()
    assert(out.count(_.isNullAt(1)) == 2)
    val a = out.filter(r => !r.isNullAt(0) && r.getString(0) == "a")
      .map(_.getSeq[Float](1))
    assert(a.length == 2 && a(0) == a(1))
  }

  test("embedding is a narrow transformation (no shuffle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = embedder.embedDocuments(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("the same embedDocuments transform runs under readStream") {
    // the reference's ingest → embed flow as a stream: mapPartitions is
    // a streaming-compatible typed op, so continuous corpus building
    // reuses the identical operator
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val query = embedder.embedDocuments(docs, "text")
      .writeStream.format("memory").queryName("embedded_docs")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "first chunk"), (2L, "second chunk"))
      query.processAllAvailable()
      input.addData((3L, "first chunk")) // same text, later batch
      query.processAllAvailable()
      val rows = spark.table("embedded_docs")
        .select(col("doc_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      assert(rows.keySet == Set(1L, 2L, 3L))
      assert(rows(1L) == rows(3L), "same text must embed identically")
      assert(rows(1L) != rows(2L))
    } finally query.stop()
  }
}
