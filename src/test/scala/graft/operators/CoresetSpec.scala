package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Coreset.farthestFirst]] — the greedy max-min laws on constructed
  * geometry (the cross-engine arithmetic half is the q208 oracle). */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  // three tight clusters along different axes plus an in-between
  // point: farthest-first must visit one point per cluster before
  // refining inside any of them.
  private def corpus = Seq(
    (1L, Seq(1f, 0f, 0f, 0f)),       // cluster A (the seed)
    (2L, Seq(0.99f, 0.141f, 0f, 0f)), // A, near 1
    (3L, Seq(0f, 1f, 0f, 0f)),       // cluster B — orthogonal to A
    (4L, Seq(0f, 0.99f, 0.141f, 0f)), // B, near 3
    (5L, Seq(0f, 0f, 0f, 1f)),       // cluster C — orthogonal to both
    (6L, Seq(0.7071f, 0.7071f, 0f, 0f)) // between A and B
  ).toDF("vec_id", "embedding")

  test("the seed is rank 1 with radius 0; every later radius is the max-min at selection") {
    val r = Coreset.farthestFirst(corpus, "embedding", "vec_id",
      k = 3, seedId = 1L).orderBy("rank").collect()
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 1L &&
      r(0).getLong(2) == 0L)
    // step 2: everything orthogonal to the seed sits at distance
    // 10000 (cos 0); smallest-id tie-break picks 3 over 5
    assert(r(1).getLong(1) == 3L)
    assert(r(1).getLong(2) == 10000L)
    // step 3: with A and B covered, the only point still at cos 0 to
    // BOTH centers is 5 — the third cluster, not a refinement of A/B
    assert(r(2).getLong(1) == 5L)
    assert(r(2).getLong(2) == 10000L)
  }

  test("covering radii are non-increasing and selected ids are distinct") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Coreset.farthestFirst(emb, "embedding", "vec_id",
      k = 6, seedId = 0L).orderBy("rank").collect()
    assert(r.map(_.getLong(1)).distinct.length == 6)
    val radii = r.drop(1).map(_.getLong(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radius sequence must be non-increasing: ${radii.toSeq}")
    assert(r(0).getLong(2) == 0L)
  }

  test("every selection maximizes the true min-distance over the remaining corpus") {
    // replay the greedy by hand: at each step the chosen point's
    // recorded radius equals the maximum over unselected rows of the
    // minimum quantized distance to the already-selected set
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    def qd(a: Seq[Double], b: Seq[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      10000L - math.floor(dot / (na * nb) * 1e4 + 0.5).toLong
    }
    val r = Coreset.farthestFirst(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "embedding", "vec_id", k = 4, seedId = 0L)
      .orderBy("rank").collect()
    val picks = r.map(x => (x.getLong(1), x.getLong(2)))
    for (t <- 1 until picks.length) {
      val sel = picks.take(t).map(_._1)
      val best = emb.keys.filterNot(sel.contains).map { id =>
        (sel.map(s => qd(emb(id), emb(s))).min, id)
      }.maxBy { case (d, id) => (d, -id) }
      assert(best._2 == picks(t)._1 && best._1 == picks(t)._2,
        s"step ${t + 1}: expected $best, got ${picks(t)}")
    }
  }
}
