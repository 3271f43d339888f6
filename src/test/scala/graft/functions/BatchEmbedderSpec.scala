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
}
