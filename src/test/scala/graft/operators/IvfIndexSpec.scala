package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val embeddings =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  private lazy val index =
    IvfIndex.build(embeddings, "vec_id", "embedding", nlist = 8)

  private def queryVecs(n: Int): Seq[Seq[Float]] =
    embeddings.orderBy("vec_id").limit(n)
      .select("embedding").collect().map(_.getSeq[Float](0)).toSeq

  private def exactTopK(q: Seq[Float], k: Int): Set[Long] =
    KnnSearch.topK(embeddings, "embedding", q, k, KnnSearch.L2,
        tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("full-probe IVF search is exact (recall 1.0)") {
    val q = queryVecs(1).head
    val approx = index.search(q, 10, nprobe = index.nlist,
      tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(approx == exactTopK(q, 10))
  }

  test("nprobe=6/8 reaches recall >= 0.95; recall grows with nprobe") {
    val ks = 10
    def meanRecall(nprobe: Int): Double = {
      val rs = queryVecs(10).map { q =>
        val exact = exactTopK(q, ks)
        val approx = index.search(q, ks, nprobe = nprobe,
          tieBreak = Some("vec_id"))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact.intersect(approx).size.toDouble / ks
      }
      rs.sum / rs.size
    }
    val atHalf = meanRecall(index.nlist / 2)
    val atThreeQ = meanRecall(6)
    assert(atThreeQ >= 0.95, s"recall at nprobe=6: $atThreeQ")
    assert(atThreeQ >= atHalf, "recall must be monotone in nprobe")
  }

  test("probe pruning cuts the scanned fraction") {
    val q = queryVecs(1).head
    val probes = index.probeOrder(q).take(2)
    val scanned = index.assigned
      .filter(col(IvfIndex.ClusterCol).isin(probes: _*)).count()
    assert(scanned < embeddings.count(),
      s"probing 2/8 clusters must scan a strict subset ($scanned)")
  }

  test("persisted index round-trips and still searches with high recall") {
    val tmp = Files.createTempDirectory("graft-ivf-").toString
    index.write(s"$tmp/ivf")
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    assert(loaded.nlist == index.nlist)
    // centroids come from the sidecar, so the round-trip is bit-exact —
    // not a lossy mean recomputation
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      index.centroids.map(_.toSeq).toSeq)
    val q = queryVecs(1).head
    val res = loaded.search(q, 10, nprobe = loaded.nlist,
      tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
    // pruned probe prunes parquet partition DIRECTORIES on the cluster col
    val probes = loaded.probeOrder(q).take(2)
    val plan = loaded.assigned
      .filter(col(IvfIndex.ClusterCol).isin(probes: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains(IvfIndex.ClusterCol))
  }

  test("searchBatch equals per-query exact top-k over the union-probed scan") {
    val qs = embeddings.filter(col("vec_id").isin(0, 1, 2))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = index.searchBatch(qs, "qid", "qv", k = 5, nprobe = 3,
        tieBreak = "vec_id", rankRoundDp = Some(4))
      .select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the same pruned subset, per query, through exact topK
    val probes = queryVecs(3).flatMap(q => index.probeOrder(q).take(3))
      .distinct
    val pruned = index.assigned
      .filter(col(IvfIndex.ClusterCol).isin(probes: _*))
    val single = queryVecs(3).zipWithIndex.flatMap { case (q, i) =>
      KnnSearch.topK(pruned, "embedding", q, 5, KnnSearch.L2,
          tieBreak = Some("vec_id"), rankRoundDp = Some(4))
        .select("vec_id").collect().map(r => (i.toLong, r.getLong(0)))
    }.toSet
    assert(batch == single)
    // and each query's recall ≥ its own single-probe search recall
    queryVecs(3).zipWithIndex.foreach { case (q, i) =>
      val exact = exactTopK(q, 5)
      val own = index.search(q, 5, nprobe = 3, tieBreak = Some("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val got = batch.collect { case (qid, v) if qid == i.toLong => v }
      assert(got.intersect(exact).size >= own.intersect(exact).size)
    }
  }

  test("load falls back to per-(cluster,dim) means without a sidecar") {
    val tmp = Files.createTempDirectory("graft-ivf-").toString
    index.write(s"$tmp/ivf")
    // simulate a legacy index: drop the sidecar
    val sidecar = new java.io.File(s"$tmp/ivf/_centroids")
    assert(sidecar.exists(), "write() must produce the centroid sidecar")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(sidecar)
    val loaded = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    assert(loaded.nlist == index.nlist)
    // recomputed means are the k-means cluster centers up to float error
    loaded.clusterIds.zip(index.clusterIds).foreach { case (a, b) =>
      assert(a == b)
    }
    loaded.centroids.zip(index.centroids).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-3) }
    }
    val q = queryVecs(1).head
    val res = loaded.search(q, 10, nprobe = loaded.nlist,
      tieBreak = Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res == exactTopK(q, 10))
  }
}
