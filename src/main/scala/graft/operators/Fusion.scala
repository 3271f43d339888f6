package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — the standard combiner for hybrid
  * retrieval (Cormack et al.: score(d) = Σ_legs 1/(k + rank_leg(d))).
  * The reference fuses dense/sparse/lexical signals by weighted SCORE
  * (bge.py:178-222, the q35 shape); RRF is the rank-space alternative
  * that needs no score calibration between legs — the right tool when
  * one leg is an L2 distance and another a BM25 score on an unrelated
  * scale.
  *
  * Each input leg is a SMALL ranked candidate list (top-N of its own
  * retrieval — k-scale by contract, not corpus-scale), so the
  * full-outer join chain joins k-row frames: every join is
  * broadcast-sized, and the result stays k-scale. Contributions are
  * summed in LEG ORDER (a fixed left fold), and 1/(k+rank) divides
  * exact small integers — IEEE-identical in any engine — so the fused
  * score is deterministic and SQL-replayable (q64). Docs missing from
  * a leg contribute 0 from it, the standard RRF convention. */
object Fusion {

  /** Fuse `legs` (each `(idCol, rankCol)` with rank 1 = best) into the
    * top-`k` by RRF score, ranked (score DESC, id ASC); score rounded
    * to `roundDp`. */
  def rrf(
      legs: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int,
      kRrf: Int = 60,
      roundDp: Int = 6): DataFrame = {
    require(legs.size >= 2, s"rrf needs >= 2 legs, got ${legs.size}")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val named = legs.zipWithIndex.map { case (df, i) =>
      // guard: a leg emitting the same id twice (a buggy upstream top-k)
      // would fan out through the full-outer chain — every later leg's
      // row duplicates, and this leg's 1/(k+rank) double-counts.
      // Collapse to the BEST (minimum) rank per id: a no-op for
      // well-formed distinct legs (k-scale groupBy, broadcast-sized),
      // the standard RRF convention otherwise.
      df.select(col(idCol), col(rankCol).as(s"__rrf_r$i"))
        .groupBy(col(idCol)).agg(min(col(s"__rrf_r$i")).as(s"__rrf_r$i"))
    }
    val joined = named.reduce((l, r) => l.join(r, Seq(idCol), "full_outer"))
    val score = named.indices
      .map(i => coalesce(
        lit(1.0) / (lit(kRrf.toDouble) + col(s"__rrf_r$i").cast("double")),
        lit(0.0)))
      .reduceLeft(_ + _)
    joined
      .select(col(idCol), round(score, roundDp).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }
}
