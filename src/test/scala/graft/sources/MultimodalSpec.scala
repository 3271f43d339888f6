package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("synthetic media encode -> distributed decode round-trips metadata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = syntheticMedia(docs)
    val decoded = decode(media).cache()
    assert(decoded.count() == docs.count())
    val row = decoded.filter(col("media_id") === 3).head()
    assert(row.kind == "image")
    assert(row.format == "png")
    assert(row.width == 3 % 640 + 16)
    assert(row.height == 3 % 480 + 16)
    // body bytes survive the container round-trip
    val textLen = docs.filter(col("doc_id") === 3)
      .select(length(col("text"))).head().getInt(0)
    assert(row.n_body_bytes == textLen)
  }

  test("decode is a narrow transformation (no shuffle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = decode(syntheticMedia(docs)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("frame sampling explodes stride-spaced indices without decoding") {
    import spark.implicits._
    val media = Seq((1L, 100), (2L, 7)).toDF("media_id", "n_frames")
    val frames = sampleFrames(media, col("n_frames"), 10)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(frames.count(_._1 == 1L) == 10) // 0,10,...,90
    assert(frames.filter(_._1 == 2L).map(_._2).toSeq == Seq(0))
  }

  test("decode rejects payloads without the container magic") {
    import spark.implicits._
    val bad = Seq(MediaRow(9L, "image", "nonsense".getBytes("UTF-8"))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      decode(bad).collect()
    }
    assert(e.getMessage != null)
  }
}
