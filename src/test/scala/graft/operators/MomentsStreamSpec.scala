package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** Streaming face of the moments artifact: the running cell
  * aggregation over a MemoryStream must snapshot to exactly the batch
  * cells — the exact-integer group-merge argument, observed through
  * Structured Streaming's state store instead of momentsMaintained's
  * explicit add/subtract. */
class MomentsStreamSpec extends SparkSpec {

  private def vec(i: Long, salt: Int): Seq[Float] =
    (0 until 6).map(j => ((i * 31 + j * 7 + salt * 13) % 97) / 97f)

  test("momentsStream snapshot equals batch moments after two micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val b1 = (0L until 80L).map(i => vec(i, 0))
    val b2 = (80L until 130L).map(i => vec(i, 1))
    val input = MemoryStream[Seq[Float]]
    val query = VectorStats.momentsStream(
        input.toDF().withColumnRenamed("value", "embedding"),
        "embedding")
      .writeStream.format("memory").queryName("moment_cells")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      // the snapshot carries the (-2, dim) marker state — consume it
      // through snapshotCells, which validates and strips it
      val streamed = VectorStats.snapshotCells(
          spark.table("moment_cells"))
        .orderBy("i", "j").collect().map(_.toSeq).toSeq
      val batch = VectorStats.moments(
          (b1 ++ b2).toDF("embedding"), "embedding")
        .orderBy("i", "j").collect().map(_.toSeq).toSeq
      assert(streamed == batch,
        s"streamed cells diverged from batch (${streamed.size} vs " +
          s"${batch.size} rows)")
    } finally query.stop()
  }

  test("a stream batch with a different dim trips the snapshot-time tripwire") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Seq[Float]]
    val query = VectorStats.momentsStream(
        input.toDF().withColumnRenamed("value", "embedding"),
        "embedding")
      .writeStream.format("memory").queryName("moment_cells_mixed")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((0L until 10L).map(i => vec(i, 0)): _*)
      query.processAllAvailable()
      // a second batch of dim-7 vectors: within-partition fold can't
      // see the dim-6 history, but the marker state can
      input.addData((0L until 10L).map(i =>
        (0 until 7).map(j => ((i * 31 + j * 7) % 97) / 97f)): _*)
      query.processAllAvailable()
      val ex = intercept[Exception] {
        VectorStats.snapshotCells(spark.table("moment_cells_mixed"))
          .collect()
      }
      assert(ex.getMessage != null &&
        ex.getMessage.contains("mixed vector dims"),
        s"wrong failure: ${ex.getMessage}")
    } finally query.stop()
  }

  test("powerIterationPcFromCells refuses a RAW stream state (markers present)") {
    // r15 advice: the PCA consumer used to silently ignore unknown
    // keys, so feeding it raw momentsStream state bypassed the
    // mixed-dim check the (-2, dim) markers exist for — it must force
    // the snapshotCells route instead
    import spark.implicits._
    val dim = 4
    val corpus = (0L until 20L).map(i => Tuple1(vec(i, 0).take(dim)))
      .toDF("embedding")
    val raw = VectorStats.momentsStream(corpus, "embedding")
    val ex = intercept[IllegalArgumentException] {
      VectorStats.powerIterationPcFromCells(spark, raw, dim)
    }
    assert(ex.getMessage.contains("snapshotCells"),
      s"wrong failure: ${ex.getMessage}")
    // and the sanctioned route works on the very same frame
    val viaSnapshot = VectorStats.powerIterationPcFromCells(spark,
      VectorStats.snapshotCells(raw), dim).collect()
    assert(viaSnapshot.length == dim)
  }
}
