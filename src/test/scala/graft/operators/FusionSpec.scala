package graft.operators

import graft.SparkSpec

class FusionSpec extends SparkSpec {

  test("rrf: hand-checked scores, missing-leg zero contribution, deterministic ties") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Fusion.rrf(Seq(a, b), "id", "rank", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val score = out.toMap
    def rr(r: Int): Double = 1.0 / (60.0 + r)
    def rnd(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // doc 20 appears in both legs; 10/30/40 in one each
    assert(score(20L) == rnd(rr(2) + rr(1)))
    assert(score(10L) == rnd(rr(1)))
    assert(score(40L) == rnd(rr(2)))
    assert(score(30L) == rnd(rr(3)))
    // both-legs doc outranks every single-leg doc; order deterministic
    assert(out.head._1 == 20L)
    assert(out.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L))
  }

  test("rrf: a duplicated id within a leg contributes only its BEST " +
      "rank and never fans out") {
    import spark.implicits._
    // leg a lists doc 10 twice (a buggy upstream top-k): without the
    // per-leg min-rank collapse, the full-outer chain would duplicate
    // every later leg's row for doc 10 AND double-count leg a's
    // contribution; with it, doc 10 scores as rank 1 exactly once
    val a = Seq((10L, 1), (10L, 3), (20L, 2)).toDF("id", "rank")
    val b = Seq((10L, 2), (30L, 1)).toDF("id", "rank")
    val out = Fusion.rrf(Seq(a, b), "id", "rank", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.map(_._1).length == out.map(_._1).distinct.length,
      s"duplicate ids in the fused output: ${out.toSeq}")
    def rr(r: Int): Double = 1.0 / (60.0 + r)
    def rnd(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val score = out.toMap
    assert(score(10L) == rnd(rr(1) + rr(2)))
    assert(score(20L) == rnd(rr(2)))
    assert(score(30L) == rnd(rr(1)))
  }

  test("rrf rejects fewer than two legs") {
    import spark.implicits._
    val a = Seq((1L, 1)).toDF("id", "rank")
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq(a), "id", "rank", k = 5)
    }
  }
}
