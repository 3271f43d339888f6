package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Scale probe for [[IvfIndex.searchBatch]]'s DIVERSE-batch design.
  *
  * An ungated shared scan is the hazard: with a diverse batch the probe
  * union approaches nlist (the prune evaporates) and every scanned row
  * pays every query's distance loop — |union|/nlist × |queries| corpus
  * row-scores. Two remedies were evaluated; the numbers below are why
  * the probe GATE won and a cap-the-union grouping design was dropped:
  *
  *   - grouping (per-group pruned scans) reaches the row-score floor
  *     Σ_q nprobe/nlist only at cap = nprobe, where it degenerates to
  *     ~|queries| scans — it buys compute by RE-READING shared clusters
  *     (measured here: 12.5 ×corpus bytes at the floor);
  *   - gating (one union scan; a row is scored against query i only if
  *     its cluster is in query i's own probe set) reaches the same
  *     floor with ONE |union|-scan — strictly better on both axes, and
  *     it makes each query's result bit-equal to single-query search.
  *
  * This tool prints the analytic fractions for the current corpus and
  * times the real gated [[IvfIndex.searchBatch]] against the per-query
  * [[IvfIndex.search]] loop it replaces (|queries| separate jobs). Run:
  * `scripts/run_main.sh graft.tools.ProbeUnionBench [sfDir]`
  * (default /root/testdata/sf0.1; nlist=64, nprobe=8, 100 stride-spread
  * queries — the diverse worst case).
  */
object ProbeUnionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nlist = 64
    val nprobe = 8
    val nQueries = 100
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft_probe_union_").toString
    IvfIndex.build(emb, "vec_id", "embedding", nlist = nlist).write(root)
    val index = IvfIndex.load(spark, root, "vec_id", "embedding")

    // a DIVERSE batch: stride-spread queries land across many clusters —
    // the worst case for a shared scan, deterministic by construction
    val stride = math.max(1L, n / nQueries)
    val queries = emb.filter(col("vec_id") % stride === 0)
      .limit(nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .cache()
    val qVecs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))

    val probeSets = qVecs.map { case (_, v) =>
      index.probeOrder(v).take(nprobe)
    }
    val union = probeSets.flatten.distinct.length
    val ungatedWork = union.toDouble / nlist * qVecs.length
    val floorWork = probeSets.map(_.length.toDouble / nlist).sum
    println(s"corpus=$n nlist=$nlist nprobe=$nprobe queries=${qVecs.length}")
    println(f"union=$union/$nlist scan=${union.toDouble / nlist}%.2f×corpus  " +
      f"row-scores ungated=${ungatedWork}%.1f gated=${floorWork}%.1f ×corpus")

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"$label%-22s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        s"rows=$rows")
    }
    // warm both paths once (JIT + IO cache), then time
    index.searchBatch(queries, "qid", "qv", k = 10, nprobe = nprobe,
      tieBreak = "vec_id").count()
    index.search(qVecs.head._2, 10, nprobe, tieBreak = Some("vec_id")).count()
    timed("gated batch (1 scan)") {
      index.searchBatch(queries, "qid", "qv", k = 10, nprobe = nprobe,
        tieBreak = "vec_id").count()
    }
    timed(s"per-query loop (×${qVecs.length})") {
      qVecs.map { case (_, v) =>
        index.search(v, 10, nprobe, tieBreak = Some("vec_id")).count()
      }.sum
    }
    spark.stop()
  }
}
