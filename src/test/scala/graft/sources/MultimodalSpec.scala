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

  test("resize: pass-through, binding axis, truncation; narrow plan") {
    import spark.implicits._
    val decoded = Seq(
      DecodedMedia(1L, "image", 32, 20, "png", 1000),   // inside the box
      DecodedMedia(2L, "image", 640, 200, "png", 1000), // width binds
      DecodedMedia(3L, "image", 100, 480, "png", 997),  // height binds
      DecodedMedia(4L, "image", 65, 64, "png", 10)      // one axis over
    ).toDS()
    val out = resize(decoded, 64, 64).collect()
      .map(r => r.media_id -> r).toMap
    assert((out(1L).width, out(1L).height) == (32, 20))
    assert(out(1L).n_body_bytes == 1000) // area ratio 1 -> bytes intact
    // 640x200 -> width binds: (64, 200*64/640=20)
    assert((out(2L).width, out(2L).height) == (64, 20))
    assert(out(2L).n_body_bytes == 1000L * (64 * 20) / (640 * 200))
    // 100x480 -> height binds: (100*64/480=13 truncated, 64)
    assert((out(3L).width, out(3L).height) == (13, 64))
    assert(out(3L).n_body_bytes == (997L * (13 * 64) / (100 * 480)).toInt)
    // 65x64: width binds (64*64 <= 64*65): (64, 64*64/65=63)
    assert((out(4L).width, out(4L).height) == (64, 63))
    val plan = resize(decoded, 64, 64).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("features: md5 words of the body, fused decode, magic enforced") {
    import spark.implicits._
    val body = "hello world"
    val media = Seq(MediaRow(7L, "image",
      encodeFake(100, 50, "png", body.getBytes("UTF-8")))).toDS()
    val f = features(media).head()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(f.f0 == java.lang.Long.parseLong(hex.substring(0, 8), 16))
    assert(f.f3 == java.lang.Long.parseLong(hex.substring(24, 32), 16))
    val bad = Seq(MediaRow(9L, "image", "junk".getBytes("UTF-8"))).toDS()
    intercept[org.apache.spark.SparkException] { features(bad).collect() }
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
