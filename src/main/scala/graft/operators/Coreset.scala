package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSimilarityNative

/** Farthest-first traversal (Gonzalez 1985) — the k-CENTER coreset
  * selector: greedily pick the point farthest (max-min distance) from
  * everything selected so far. The selected set is a 2-approximation
  * of the optimal k-center cover, and the distance of each newly
  * chosen point IS the covering radius of the set before it joined —
  * the classic "how well do k exemplars summarize this corpus" curve
  * a data-selection pass reads (coreset distillation, eval-set
  * seeding, annotation budgeting). Complements the SAMPLING selectors
  * (q65 stratified / q71 temperature / q120 weighted / q187
  * diversity-capped): those apportion mass, this maximizes coverage.
  *
  * Determinism regime: distance is integer 4-dp quantized cosine
  * distance `10000 − floor(cos·1e4 + 0.5)` (the q136 exactness
  * discipline), argmax ties break to the smallest id — the greedy
  * trace is exact integer arithmetic an oracle replays step by step.
  *
  * Scale shape: k driver-side steps, each ONE bounded job — the
  * corpus is scanned with a `least(...)` over ≤ k broadcast center
  * literals (no join, no shuffle) and cut by TakeOrderedAndProject(1).
  * Selected state on the driver is k vectors (k·dim floats). At 100 TB
  * that is k narrow scans — the standard distributed k-center loop —
  * and the scan could share one cached pass per step if the corpus
  * were pinned; it is deliberately not cached here (k small, cache
  * residency at corpus scale costs more than k scans buy).
  */
object Coreset {

  /** Greedy k-center selection over `corpus`. Returns one row per
    * selected exemplar: `rank` (selection order, 1 = seed), the id
    * column, and `radius` — the point's max-min integer distance at
    * selection time (0 for the seed), i.e. the covering radius of the
    * first `rank − 1` centers. */
  def farthestFirst(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, seedId: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    graft.plans.VectorExpressions.ensureRegistered(spark)
    def qdist(center: Seq[Float]): Column =
      lit(10000L) - floor(cosineSimilarityNative(col(vecCol),
        KnnSearch.litVec(center)) * lit(1e4) + lit(0.5)).cast("long")
    val seedRow = corpus.filter(col(idCol) === seedId)
      .select(col(vecCol)).collect().headOption.getOrElse(
        throw new IllegalArgumentException(
          s"farthestFirst: no row with $idCol = $seedId in the corpus"))
    val seed = Option(seedRow.getSeq[Float](0)).getOrElse(
      throw new IllegalArgumentException(
        s"farthestFirst: seed row $idCol = $seedId has a null $vecCol"))
    var selected = Vector[(Long, Seq[Float], Long)]((seedId, seed, 0L))
    // fewer than k usable rows → truncate (the selected prefix is
    // still the exact greedy trace) rather than NPE mid-loop
    var exhausted = false
    for (_ <- 2 to k if !exhausted) {
      val minDist = selected.map(s => qdist(s._2)).reduce(least(_, _))
      corpus
        .filter(!col(idCol).isInCollection(selected.map(_._1)) &&
          col(vecCol).isNotNull)
        .select(col(idCol).cast("long"), col(vecCol),
          minDist.as("d"))
        .orderBy(col("d").desc, col(idCol))
        .limit(1).collect().headOption match {
        case Some(chosen) =>
          selected :+= ((chosen.getLong(0), chosen.getSeq[Float](1),
            chosen.getLong(2)))
        case None => exhausted = true
      }
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1L, id, d) }
      .toDF("rank", idCol, "radius")
  }
}
