package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.plans.VectorExpressions

/** Amortization + SCALE-CURVE measurement for the batch graph walk
  * (r14 verdict #7, carried to r16 #5): N single-query beam searches
  * (2 jobs per hop EACH) vs one [[IvfIndex.beamSearchBatch]] over the
  * same query set (2 jobs per hop TOTAL), across |queries| ∈
  * {10, 100, 1000} — the data the in-plan-batch-walk decision needs.
  * Vary |graph| by pointing at different sf dirs (sf0.01 → 500
  * vectors, sf0.1 → 5,000 — the 10× corpus).
  *
  * Run: `scripts/run_main.sh graft.tools.BeamBatchBench [sfDir] [nqs]`
  * where nqs is comma-separated (default `10,100,1000`). Query sets
  * larger than the corpus cycle through it with a deterministic
  * per-replica scale (1 + r/64) so every query is distinct and walks
  * a real path. Single-walk totals are measured min-of-3 at nq=10,
  * once at nq=100, and extrapolated (per-walk × nq) beyond — 1,000
  * sequential walks would be minutes of pure job-scheduling overhead,
  * which is the point the curve records. */
object BeamBatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nqs = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10, 100, 1000))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorExpressions.ensureRegistered(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVec = emb.count()
    val index = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
    val graph = index.knnGraph(k = 3, nprobe = 2).localCheckpoint()
    val nEdge = graph.count()
    val baseRows = emb.orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1))
    def queriesFor(nq: Int): Seq[(Long, Seq[Float])] =
      (0 until nq).map { i =>
        val v = baseRows(i % baseRows.length)
        val scale = 1f + (i / baseRows.length).toFloat / 64f
        (i.toLong, v.map(_ * scale))
      }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm-up both paths once
    locally {
      val q = queriesFor(1)
      val e = index.coarseEntryBatch(q, sampleMod = 16)
      index.beamSearch(graph, q.head._2, e.head, 5, 4, 2).collect()
      index.beamSearchBatch(graph, q, e, 5, 4, 2).collect()
    }

    println(f"BEAMBENCH sfDir=$sfDir vectors=$nVec edges=$nEdge hops=2")
    for (nq <- nqs) {
      val queries = queriesFor(nq)
      val entries = index.coarseEntryBatch(queries, sampleMod = 16)
      val batch = (1 to 3).map(_ => time {
        index.beamSearchBatch(graph, queries, entries, 5, 4, 2)
          .collect()
      }).min
      val singleReps = if (nq <= 10) 3 else if (nq <= 100) 1 else 0
      val (single, singleTag) =
        if (singleReps > 0) {
          val s = (1 to singleReps).map(_ => time {
            queries.zip(entries).foreach { case ((_, qv), e) =>
              index.beamSearch(graph, qv, e, 5, 4, 2).collect() }
          }).min
          (s, "measured")
        } else {
          // per-walk cost from a 10-walk sample, scaled — sequential
          // walks are embarrassingly linear in nq by construction
          val sample = queries.take(10).zip(entries.take(10))
          val s = time { sample.foreach { case ((_, qv), e) =>
            index.beamSearch(graph, qv, e, 5, 4, 2).collect() } }
          (s / 10 * nq, "extrapolated")
        }
      println(f"BEAMBENCH nq=$nq single_total=$single%.3f s " +
        f"($singleTag) batch_total=$batch%.3f s " +
        f"batch_per_query=${batch / nq * 1000}%.2f ms " +
        f"speedup=${single / batch}%.2fx")
    }
    spark.stop()
  }
}
