package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BinaryHash, KnnSearch}
import graft.functions.VectorFunctions
import graft.plans.VectorExpressions

/** Amortization measurement for the binary rung's batch face (q232) —
  * the house rule: a scale claim ships with its own numbers. N
  * single-query [[BinaryHash.topKStored]] calls pay N full (id, code)
  * scans + N re-rank jobs; ONE [[BinaryHash.topKStoredBatch]] pays one
  * shared scan (rows expanded |queries|x AFTER pruning to ~16
  * bytes/row) + one bounded re-rank — so the batch win is the scan
  * count, and it should GROW with |queries| while per-query batch cost
  * stays flat. Both paths run the same filtered contract
  * (vec_id % 3 = 1) so the comparison is the production shape.
  *
  * Run: `scripts/run_main.sh graft.tools.BinaryBatchBench [sfDir] [nqs]`
  * (nqs comma-separated, default `4,16,64`). Query sets cycle the
  * corpus with a deterministic per-replica scale so every query is
  * distinct. Singles are measured min-of-3 at the smallest nq and
  * once above it — the sequential-scan overhead IS the point the
  * curve records. */
object BinaryBatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nqs = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(4, 16, 64))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorExpressions.ensureRegistered(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val stored = BinaryHash.withCodes(
      emb.select("vec_id", "embedding"), "embedding", dim)
      .localCheckpoint()
    val nVec = stored.count()
    val pred = pmod(col("vec_id"), lit(3L)) === 1L
    val baseRows = emb.orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0))
    def queriesFor(nq: Int): Seq[(Long, Seq[Float])] =
      (0 until nq).map { i =>
        val v = baseRows(i % baseRows.length)
        val scale = 1f + (i / baseRows.length).toFloat / 64f
        (i.toLong, v.map(_ * scale))
      }
    def single(qv: Seq[Float]): Unit =
      BinaryHash.topKStored(stored, BinaryHash.CodeCol, "embedding",
        "vec_id", qv, k = 10, candidates = 50,
        rerank = v => KnnSearch.roundHalfUpCol(
          VectorFunctions.cosineSimilarityNative(
            v, KnnSearch.litVec(qv)), 4),
        filter = Some(pred)).collect()
    def batch(qs: Seq[(Long, Seq[Float])]): Unit =
      BinaryHash.topKStoredBatch(stored, BinaryHash.CodeCol,
        "embedding", "vec_id", qs, k = 10, candidates = 50,
        rerankDp = 4, filter = Some(pred)).collect()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths
    single(queriesFor(1).head._2); batch(queriesFor(2))

    println(s"corpus=$nVec vectors, dim=$dim, " +
      "k=10 candidates=50 filter=vec_id%3=1")
    for (nq <- nqs) {
      val qs = queriesFor(nq)
      // singles: min-of-3 at the smallest size, once above it
      val reps = if (nq == nqs.min) 3 else 1
      val tSingle = (1 to reps)
        .map(_ => time(qs.foreach { case (_, qv) => single(qv) })).min
      val tBatch = (1 to 3).map(_ => time(batch(qs))).min
      println(f"nq=$nq%4d  singles=$tSingle%7.2fs  " +
        f"batch=$tBatch%6.2fs  speedup=${tSingle / tBatch}%5.1fx  " +
        f"perQueryBatch=${tBatch / nq * 1000}%7.1f ms")
    }
    spark.stop()
  }
}
