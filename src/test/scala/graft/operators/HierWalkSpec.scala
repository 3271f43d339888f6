package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** True per-layer HNSW descent ([[IvfIndex.hierWalkEntry]] walking
  * [[IvfIndex.layerGraph]]s) vs the scanning descent
  * ([[IvfIndex.hierEntry]]): layer containment, determinism,
  * rows-touched accounting, and entry quality on the deterministic
  * synthetic corpus. */
class HierWalkSpec extends SparkSpec {
  import spark.implicits._

  private val n = 600L
  private def vec(i: Long): Seq[Float] =
    (0 until 8).map(j => ((i * 37 + j * 11) % 101) / 101f - 0.5f)
  private lazy val corpus =
    (0L until n).map(i => (i, vec(i))).toDF("vec_id", "embedding")
  private lazy val idx =
    IvfIndex.build(corpus, "vec_id", "embedding", nlist = 4)
  private val base = 16
  private val layers = 2
  private val kGraph = 3
  private val hopsPerLayer = 2
  private lazy val graphs = (1 to layers).map(l =>
    idx.layerGraph(l, base, k = kGraph, nprobe = 2).localCheckpoint())

  private def memberIds(layer: Int): Set[Long] = {
    val mod = Seq.fill(layer)(base.toLong).product
    idx.assigned.filter(
        conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % mod === 0L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
  }

  test("layer graphs never leave their layer, and edges are the member-restricted kNN") {
    for (l <- 1 to layers) {
      val members = memberIds(l)
      assert(members.nonEmpty, s"layer $l is empty — corpus too small")
      val edges = graphs(l - 1)
        .select("src", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(edges.nonEmpty, s"layer $l graph is empty")
      assert(edges.forall { case (s0, n0) =>
        members(s0) && members(n0) },
        s"layer $l graph has an edge leaving the layer")
      assert(edges.forall { case (s0, n0) => s0 != n0 },
        s"layer $l graph has a self-edge")
    }
    // nesting: layer 2 members are layer 1 members
    assert(memberIds(2).subsetOf(memberIds(1)))
  }

  test("walked descent is deterministic, lands a layer-1 member, and touches fewer rows than the scanning descent") {
    val q = vec(7L).map(x => (x * 1.1f))
    val e1 = idx.hierWalkEntry(graphs, q, base, hopsPerLayer)
    val e2 = idx.hierWalkEntry(graphs, q, base, hopsPerLayer)
    assert(e1 == e2, "walked descent must be deterministic")
    assert(memberIds(1)(e1),
      "the walked entry must be a member of layer 1")

    // rows SCORED by each descent: the scan scores every member it
    // scans (top layer globally, lower layers probe-restricted); the
    // walk scores at most (hops·beam·kGraph + 1) nodes per layer.
    val probes = idx.probeOrder(q).take(2)
    val l1InProbes = idx.assigned
      .filter(conv(substring(md5(col("vec_id").cast("string")), 1, 8),
        16, 10).cast("long") % base === 0L)
      .filter(col(IvfIndex.ClusterCol).isin(probes: _*))
      .count()
    val scanRows = memberIds(2).size + l1InProbes
    val walkBound = layers * (hopsPerLayer * 1 * kGraph + 1)
    assert(walkBound < scanRows,
      s"walk bound $walkBound must beat the scan's $scanRows scored rows")
  }

  test("a null-vector min-id top member cannot become the descent entry") {
    // r15 advice: layer graphs exclude null-vector rows on both sides
    // (the r13 convention), but the top-entry min(id) did not — a
    // null-vector min-id top member has no edges in ANY layer graph
    // and a null rounded distance that sorts NULLS FIRST, so the whole
    // descent silently carried a degenerate entry. Null out the
    // top-layer min member's vector and pin that the descent now
    // behaves as if the row were absent.
    val m = memberIds(2).min
    val nulled = idx.copy(assigned = idx.assigned
      .withColumn("embedding",
        when(col("vec_id") === m, lit(null).cast("array<float>"))
          .otherwise(col("embedding"))))
    val dropped = idx.copy(assigned =
      idx.assigned.filter(col("vec_id") =!= m))
    val q = vec(7L).map(_ * 1.1f)
    def descend(i: IvfIndex): Long = i.hierWalkEntry(
      (1 to layers).map(l =>
        i.layerGraph(l, base, k = kGraph, nprobe = 2).localCheckpoint()),
      q, base, hopsPerLayer)
    val eNulled = descend(nulled)
    assert(eNulled != m, "descent entry must not be the null-vector row")
    assert(eNulled == descend(dropped),
      "a null-vector row must act exactly like an absent row")
  }

  test("entry quality: walked descent's downstream recall matches the scanning descent's on this corpus") {
    val graph = idx.knnGraph(k = kGraph, nprobe = 2).localCheckpoint()
    def recallFrom(entry: Long, q: Seq[Float]): Double = {
      val approx = idx.beamSearch(graph, q, entry, k = 5, beam = 4,
          hops = 2)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = KnnSearch.topK(corpus, "embedding", q, 5,
          KnnSearch.L2, tieBreak = Some("vec_id"), rankRoundDp = Some(4))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      approx.intersect(exact).size.toDouble / 5.0
    }
    val qs = Seq(3L, 77L, 203L, 450L).map(i => vec(i).map(_ * 1.05f))
    val scanned = qs.map(q =>
      recallFrom(idx.hierEntry(q, layers, base, nprobe = 2), q))
    val walked = qs.map(q =>
      recallFrom(idx.hierWalkEntry(graphs, q, base, hopsPerLayer), q))
    info(s"scanned-entry recalls: $scanned")
    info(s"walked-entry recalls:  $walked")
    // measured equal on this corpus (0.0/0.8/0.0/0.8 both ways) —
    // pinned as non-inferiority so a walk regression fails loudly
    assert(walked.sum >= scanned.sum,
      s"walked-entry recall ($walked) fell below scanned ($scanned)")
  }
}
