package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Graph.pageRankPpb]] — the integer-ppb PageRank: fixed points,
  * pinned dangling-variant values, mass conservation up to truncation,
  * and bit-stability under partitioning (the property the q119 oracle's
  * unrolled SQL iterations depend on). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iters: Int,
      parts: Int = 4): Map[String, Long] =
    Graph.pageRankPpb(edges.toDF("s", "d").repartition(parts), "s", "d",
        iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("two-node cycle is a fixed point at exactly 10^9 per node") {
    val r = ranksOf(Seq(("a", "b"), ("b", "a")), 5)
    // base + damped whole rank: 150e6 + (1e9·85 div 100) = 1e9 — no
    // truncation anywhere, so the start vector never moves
    assert(r == Map("a" -> 1000000000L, "b" -> 1000000000L), r.toString)
  }

  test("dangling variant is pinned: un-mirrored edge leaks the sink's damped mass") {
    // a -> b only. r1(a) = base; r1(b) = base + 850e6;
    // r2(a) = base; r2(b) = base + (base·85 div 100) = 277_500_000
    val r1 = ranksOf(Seq(("a", "b")), 1)
    assert(r1 == Map("a" -> 150000000L, "b" -> 1000000000L), r1.toString)
    val r2 = ranksOf(Seq(("a", "b")), 2)
    assert(r2 == Map("a" -> 150000000L, "b" -> 277500000L), r2.toString)
  }

  test("mirrored graphs conserve mass up to IntegralDivide truncation") {
    // star: hub <-> 6 spokes, mirrored = no dangling nodes
    val spokes = (1 to 6).map(i => ("hub", s"n$i"))
    val edges = spokes ++ spokes.map(_.swap)
    val n = 7L
    val iters = 4
    val total = ranksOf(edges, iters).values.sum
    val whole = n * 1000000000L
    // each edge's contribution truncates < 2 per hop (two divs), and
    // the base term is exact — the leak is bounded and tiny
    val maxLeak = iters.toLong * 2L * edges.size
    assert(total <= whole && total >= whole - maxLeak,
      s"total mass $total vs whole $whole (max leak $maxLeak)")
  }

  test("ranks are bit-identical under any edge partitioning") {
    val edges = for (i <- 0 until 40; j <- Seq((i * 7) % 40, (i * 11) % 40)
      if i != j) yield (s"n$i", s"n$j")
    val mirrored = (edges ++ edges.map(_.swap)).distinct
    assert(ranksOf(mirrored, 3, parts = 1) == ranksOf(mirrored, 3, parts = 13),
      "rank vector moved with partition count")
  }

  private def triStats(edges: Seq[(Long, Long)]) =
    Graph.triangleStats(edges.toDF("u", "v"), "u", "v").collect().head

  test("triangleStats counts a known census: K4 plus a pendant") {
    // K4 on 1..4 (4 triangles, 12 wedges) + pendant 5-1
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L))
    val r = triStats(k4)
    assert(r.getLong(0) == 5L) // nodes
    assert(r.getLong(1) == 7L) // edges
    // degrees: 1→4, 2→3, 3→3, 4→3, 5→1 ⇒ wedges 6+3+3+3+0 = 15
    assert(r.getLong(2) == 15L)
    assert(r.getLong(3) == 4L) // triangles
    assert(r.getLong(4) == 3L * 4L * 1000000L / 15L) // 800000
  }

  test("triangleStats: a triangle-free graph (star) reports zero with nonzero wedges") {
    val star = (2L to 6L).map(i => (1L, i))
    val r = triStats(star)
    assert(r.getLong(3) == 0L)
    assert(r.getLong(2) == 10L) // C(5,2) wedges through the hub
    assert(r.getLong(4) == 0L)
  }

  test("triangleStats is orientation- and layout-invariant") {
    val tri = Seq((1L, 2L), (3L, 2L), (1L, 3L), (4L, 1L))
    val flipped = tri.map(_.swap)
    val a = triStats(tri)
    val b = triStats(flipped)
    assert(a.toSeq == b.toSeq)
    val parts = Graph.triangleStats(
      tri.toDF("u", "v").repartition(7), "u", "v").collect().head
    assert(a.toSeq == parts.toSeq)
  }

  test("triangleStats normalizes the edge set: duplicates and reversed listings change nothing") {
    val clean = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L))
    // every edge also listed reversed, two listed twice more, plus a
    // self-loop — degrees/wedges/triangles must not inflate
    val dirty = clean ++ clean.map(_.swap) ++
      Seq((1L, 2L), (3L, 4L), (2L, 2L))
    assert(triStats(dirty).toSeq == triStats(clean).toSeq)
  }

  test("triangleStats: degree orientation keeps hub fan-out bounded") {
    // a hub of degree 40 with triangle-free spokes: the hub must emit
    // NO oriented paths (every spoke has lower (deg, id)), so the path
    // frame is empty — the Cohen-orientation scale property, observable
    // as a zero-row path join even though wedges are C(40,2)
    val hub = (2L to 41L).map(i => (1L, i))
    val r = triStats(hub)
    assert(r.getLong(2) == (40L * 39L) / 2L)
    assert(r.getLong(3) == 0L)
  }
}
