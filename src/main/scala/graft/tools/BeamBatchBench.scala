package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.plans.VectorExpressions

/** Amortization measurement for the batch graph walk: N single-query
  * beam searches (2 jobs per hop EACH) vs one [[IvfIndex
  * .beamSearchBatch]] over the same query set (2 jobs per hop TOTAL).
  * Run: `scripts/run_main.sh graft.tools.BeamBatchBench [sfDir] [nq]`.
  * The per-hop job-scheduling overhead is the documented serving
  * caveat of the single walk; this records how the batch face
  * amortizes it. */
object BeamBatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nq = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorExpressions.ensureRegistered(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val index = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
    val graph = index.knnGraph(k = 3, nprobe = 2).localCheckpoint()
    val queries = emb.orderBy("vec_id").limit(nq)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val entries = index.coarseEntryBatch(queries, sampleMod = 16)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm-up both paths once
    queries.take(1).zip(entries.take(1)).foreach { case ((_, qv), e) =>
      index.beamSearch(graph, qv, e, 5, 4, 2).collect() }
    index.beamSearchBatch(graph, queries, entries, 5, 4, 2).collect()

    val single = (1 to 3).map(_ => time {
      queries.zip(entries).foreach { case ((_, qv), e) =>
        index.beamSearch(graph, qv, e, 5, 4, 2).collect() }
    }).min
    val batch = (1 to 3).map(_ => time {
      index.beamSearchBatch(graph, queries, entries, 5, 4, 2).collect()
    }).min
    println(f"BEAMBENCH nq=$nq single_total=$single%.3f s " +
      f"batch_total=$batch%.3f s speedup=${single / batch}%.2fx")
    spark.stop()
  }
}
