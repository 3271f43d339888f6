package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Rerank.mmr]] — the greedy-diversity laws, pinned on constructed
  * geometry (the cross-engine arithmetic half is the q136 oracle). */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // query along +x; relevance is the x-component, diversity lives in
  // the other dims (as in real retrieval pools: comparable relevance,
  // different content). 2 is an exact scaled duplicate of 1 (cosine
  // 1.0 to it); 3 matches 1's relevance but diverges; 4 slightly less
  // relevant, diverse; 5 anti-relevant.
  private val q = Seq(1f, 0f, 0f, 0f)
  private def corpus = Seq(
    (1L, Seq(0.9f, 0.4359f, 0f, 0f)),
    (2L, Seq(1.8f, 0.8718f, 0f, 0f)),  // exact scaled dup of 1
    (3L, Seq(0.9f, 0f, 0.4359f, 0f)),  // same rel as 1, diverse
    (4L, Seq(0.88f, 0f, 0f, 0.475f)),  // diverse
    (5L, Seq(-1f, 0f, 0f, 0f))         // anti-relevant
  ).toDF("vec_id", "embedding")

  test("rank 1 is the pure-relevance argmax with a zero diversity term") {
    val r = Rerank.mmr(corpus, "embedding", "vec_id", q,
      k = 3, candidates = 5).orderBy("rank").collect()
    assert(r(0).getLong(1) == 1L)
    assert(r(0).getLong(3) == 0L) // max_sim
    assert(r(0).getLong(4) == 7L * r(0).getLong(2)) // mmr = 7*rel
  }

  test("a near-duplicate of the first pick is deferred behind diverse hits") {
    val picks = Rerank.mmr(corpus, "embedding", "vec_id", q,
        k = 3, candidates = 5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(picks.head == 1L)
    assert(picks(1) != 2L,
      s"the near-duplicate must not be picked second, got $picks")
    // ...but plain relevance ranking WOULD pick it second
    val plain = corpus.select(col("vec_id"),
        graft.functions.VectorFunctions.cosineSimilarity(col("embedding"),
          KnnSearch.litVec(q)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(2).collect().map(_.getLong(0)).toSeq
    assert(plain == Seq(1L, 2L))
  }

  test("lambdaTenths = 10 reduces MMR to pure relevance order") {
    val picks = Rerank.mmr(corpus, "embedding", "vec_id", q,
        k = 4, candidates = 5, lambdaTenths = 10)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val rel = Rerank.mmr(corpus, "embedding", "vec_id", q,
        k = 4, candidates = 5, lambdaTenths = 10)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(rel == rel.sorted(Ordering[Long].reverse),
      s"relevance must be non-increasing at lambda=1: $rel")
    assert(picks.head == 1L && picks(1) == 2L)
  }

  test("k clamps to the pool and guards reject bad geometry") {
    assert(Rerank.mmr(corpus, "embedding", "vec_id", q,
      k = 5, candidates = 5).count() == 5L)
    intercept[IllegalArgumentException] {
      Rerank.mmr(corpus, "embedding", "vec_id", q, k = 6, candidates = 5)
    }
    intercept[IllegalArgumentException] {
      Rerank.mmr(corpus, "embedding", "vec_id", q, k = 1, candidates = 1,
        lambdaTenths = 11)
    }
  }

  test("randomized differential: the operator's trace equals an independent naive greedy") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 5) {
      val n = 25
      val vs = (0 until n).map(i =>
        (i.toLong, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
      val qv = Seq.fill(16)(rnd.nextFloat() - 0.5f)
      val got = Rerank.mmr(vs.toDF("vec_id", "embedding"), "embedding",
          "vec_id", qv, k = 6, candidates = n, lambdaTenths = 6)
        .orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getLong(4))).toSeq
      // independent greedy over driver-computed quantized scores
      def cosI(a: Seq[Float], b: Seq[Float]): Long = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val xa = a(i).toDouble; val xb = b(i).toDouble
          dot += xa * xb; na += xa * xa; nb += xb * xb; i += 1
        }
        val c = if (na == 0.0 || nb == 0.0) 0.0
          else dot / (math.sqrt(na) * math.sqrt(nb))
        math.floor(c * 1e4 + 0.5).toLong
      }
      val rel = vs.map { case (id, v) => id -> cosI(v, qv) }.toMap
      val vecs = vs.toMap
      var sel = Vector.empty[(Long, Long)]
      var rest = vs.map(_._1).sortBy(id => (-rel(id), id))
      while (sel.size < 6 && rest.nonEmpty) {
        val scored = rest.map { id =>
          val ms = if (sel.isEmpty) 0L
            else sel.map(s => cosI(vecs(id), vecs(s._1))).max
          (6L * rel(id) - 4L * ms, id)
        }
        val best = scored.maxBy { case (sc, id) => (sc, -id) }
        sel = sel :+ ((best._2, best._1))
        rest = rest.filterNot(_ == best._2)
      }
      assert(got == sel, s"trial $trial: got $got, ref $sel")
    }
  }

  test("mmrBatch is bit-equal per query to the single-query mmr") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.orderBy("vec_id").limit(3)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val batch = Rerank.mmrBatch(emb, "embedding", "vec_id", queries,
        k = 5, candidates = 20)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.map(_._2).sortBy(_._1).toSeq }
    queries.foreach { case (qid, qv) =>
      val single = Rerank.mmr(emb, "embedding", "vec_id", qv,
          k = 5, candidates = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      assert(batch(qid) == single, s"query $qid diverged")
    }
    intercept[IllegalArgumentException] {
      Rerank.mmrBatch(emb, "embedding", "vec_id",
        Seq((1L, Seq(1f)), (1L, Seq(2f))), 1, 1)
    }
  }

  test("the greedy trace is deterministic under repartitioning") {
    val a = Rerank.mmr(corpus.repartition(7), "embedding", "vec_id", q,
      k = 3, candidates = 5).collect().toSeq
    val b = Rerank.mmr(corpus.repartition(1), "embedding", "vec_id", q,
      k = 3, candidates = 5).collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }
}
