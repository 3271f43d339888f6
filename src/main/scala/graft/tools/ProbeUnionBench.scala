package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Scale probe for [[IvfIndex.searchBatch]]'s DIVERSE-batch hazard: the
  * unsplit batch scans the UNION of every query's probes and scores
  * every scanned row against every per-query heap, so its work is
  * |union|/nlist × |queries| row-scores (in corpus-row units). With a
  * diverse 100-query batch the union approaches nlist and the IVF prune
  * evaporates — exactly the regime `maxProbeUnion` grouping targets:
  * Σ_g |union_g|/nlist × |g| with each group a separate pruned scan.
  *
  * This tool makes the trade a NUMBER at a realistic shape (nlist=64,
  * the sf0.1 embeddings corpus, 100 spread queries, nprobe=8) so
  * PLANS.md records measured scan/work fractions instead of an argument:
  * for each cap it reports group count, Σ|union_g| (bytes-read proxy —
  * grouping re-reads shared clusters, so it RISES as caps shrink), the
  * work fraction (row-scores, the dominant term — it FALLS), and the
  * wall-clock of the real searchBatch call on the persisted index. Run:
  * `scripts/run_main.sh graft.tools.ProbeUnionBench [sfDir] [caps...]`
  * (defaults: /root/testdata/sf0.1, caps 0 32 16 8; cap 0 = unsplit).
  */
object ProbeUnionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val caps =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
      else Seq(0, 32, 16, 8)
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

    // a DIVERSE batch: queries spread across the whole id range land in
    // different clusters (the worst case for one shared scan). Stride
    // sampling keeps it deterministic.
    val stride = math.max(1L, n / nQueries)
    val queries = emb.filter(col("vec_id") % stride === 0)
      .limit(nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .cache()
    val qVecs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    println(s"corpus=$n nlist=$nlist nprobe=$nprobe queries=${qVecs.length}")

    // analytic side: probe sets + the same greedy signature-ordered
    // packing searchBatch applies (kept in sync by the cap=nprobe
    // bit-equality spec in IvfIndexSpec)
    val probeSets = qVecs.map { case (_, v) =>
      index.probeOrder(v).take(nprobe)
    }
    def groupsFor(cap: Int): Seq[Seq[Seq[Int]]] =
      if (cap <= 0) Seq(probeSets.toSeq)
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Seq[Int]]]
        val cur = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
        val union = scala.collection.mutable.Set.empty[Int]
        probeSets.sortBy(_.sorted.mkString(",")).foreach { ps =>
          val added = ps.filterNot(union)
          if (cur.nonEmpty && union.size + added.size > math.max(cap, nprobe)) {
            out += cur.toSeq; cur.clear(); union.clear()
          }
          cur += ps; union ++= ps
        }
        if (cur.nonEmpty) out += cur.toSeq
        out.toSeq
      }

    caps.foreach { cap =>
      val gs = groupsFor(cap)
      val unionSizes = gs.map(_.flatten.distinct.size)
      val scanRows = unionSizes.sum.toDouble / nlist // bytes-read proxy
      val work = gs.zip(unionSizes)
        .map { case (g, u) => u.toDouble / nlist * g.size }.sum
      val t0 = System.nanoTime()
      val got = index.searchBatch(queries, "qid", "qv", k = 10,
          nprobe = nprobe, tieBreak = "vec_id", maxProbeUnion = cap)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"cap=$cap%3d groups=${gs.size}%3d " +
        f"scan=${scanRows}%5.2f×corpus work=${work}%6.1f×corpus-rows " +
        f"wall=$secs%6.2f s rows=$got")
    }
    spark.stop()
  }
}
