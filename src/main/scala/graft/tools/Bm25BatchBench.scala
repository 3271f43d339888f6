package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bm25

/** Scale probe for [[Bm25.topKBatch]]: ONE union-vocabulary scan with
  * per-query heaps vs the per-query [[Bm25.topK]] loop it replaces.
  *
  * The loop's cost is |queries| scoring scans (tokenize + tf per doc,
  * repeated per query) even when stats are precomputed; the batch pays
  * ONE scan whose per-row work is the union-vocabulary tf pass plus
  * each query's own |terms|-length fold — the scan-amortization shape
  * of [[graft.operators.IvfIndex.searchBatch]] applied to lexical
  * retrieval. Both sides here share precomputed stats, so the measured
  * gap is pure scan-count, not the stats pass.
  *
  * Run: `scripts/run_main.sh graft.tools.Bm25BatchBench [sfDir] [nQ]`
  * (defaults /root/testdata/sf0.1, 20 queries over a 12-term pool).
  */
object Bm25BatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .appName("bm25-batch-bench")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
      docs.count() // warm the cache — both sides read identical bytes
      val pool = Seq("spark", "query", "join", "table", "window", "agg",
        "data", "fast", "slow", "row", "part", "stream")
      // deterministic 3-term queries striding the pool (no RNG)
      val queries = (0 until nQueries).map { i =>
        i -> Seq(pool(i % 12), pool((i + 4) % 12), pool((i + 8) % 12))
          .distinct
      }
      val vocab = queries.flatMap(_._2).distinct
      val cs = Bm25.stats(docs, "doc_id", "text", vocab)

      def time(label: String)(body: => Long): Long = {
        val t0 = System.nanoTime()
        val rows = body
        val ms = (System.nanoTime() - t0) / 1000000
        println(f"$label%-28s $ms%6d ms   ($rows rows)")
        ms
      }
      // warm-up once each (codegen + file listing), then measure
      Bm25.topKBatch(docs, "doc_id", "text", queries.toDF("qid", "terms"),
        "qid", "terms", k = 10, precomputed = Some(cs)).count()
      Bm25.topK(docs, "doc_id", "text", queries.head._2, k = 10,
        precomputed = Some(cs)).count()

      val batchMs = time(s"batch ($nQueries queries)") {
        Bm25.topKBatch(docs, "doc_id", "text",
            queries.toDF("qid", "terms"), "qid", "terms", k = 10,
            precomputed = Some(cs))
          .count()
      }
      val loopMs = time(s"per-query loop ($nQueries)") {
        queries.map { case (_, ts) =>
          Bm25.topK(docs, "doc_id", "text", ts, k = 10,
            precomputed = Some(cs)).count()
        }.sum
      }
      println(f"speedup: ${loopMs.toDouble / batchMs}%.1f x")
    } finally spark.stop()
  }
}
