package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — point-in-interval matching, the second classic predicate
  * Spark's planner degrades on: `p BETWEEN lo AND hi` with only range
  * conditions plans as BroadcastNestedLoopJoin (or a cartesian), which
  * is |points|·|intervals| work no matter the selectivity.
  *
  * Scale-correct form (the bin-bucketing trick behind Databricks' range
  * join optimization): intervals explode into the fixed-width BINS they
  * cover, points key into their single containing bin, and the match
  * becomes an EQUI-join on (keys…, bin) + a residual range filter.
  * Each (point, interval) pair meets in exactly one bin — the point's —
  * so no post-join dedup is needed. Work = matches + bin collisions,
  * not the cross product; `binWidth` tunes the trade (≈ the typical
  * interval length ⇒ ~2 bins per interval, join keys stay sparse).
  *
  * Coordinates must be NON-NEGATIVE longs (epoch seconds, offsets —
  * `div` truncation = floor there); a huge interval explodes into
  * (hi−lo)/binWidth bins — cap interval length upstream or widen the
  * bins (the skew note every bin-bucketed range join carries).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      keys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"`$loCol` div ${binWidth}L"),
        expr(s"`$hiCol` div ${binWidth}L"))))
    val pt = points.withColumn("__bin", expr(s"`$pCol` div ${binWidth}L"))
    pt.join(iv, (keys :+ "__bin").toIndexedSeq)
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs where `[lLo,lHi]` and `[rLo,rHi]`
    * intersect (closed intervals, same non-negative-long contract).
    * Overlapping pairs meet in EVERY bin their intersection covers, so
    * unlike the point form a dedup rule is needed: a pair is emitted
    * only from its CANONICAL bin — the first bin of the intersection,
    * `max(lLo, rLo) div binWidth` — which both sides necessarily
    * cover, keeping exactly one copy without a distinct/shuffle. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      keys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val l = left.withColumn("__bin",
      explode(sequence(expr(s"`$lLo` div ${binWidth}L"),
        expr(s"`$lHi` div ${binWidth}L"))))
    val r = right.withColumn("__bin",
      explode(sequence(expr(s"`$rLo` div ${binWidth}L"),
        expr(s"`$rHi` div ${binWidth}L"))))
    l.join(r, (keys :+ "__bin").toIndexedSeq)
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") ===
        expr(s"greatest(`$lLo`, `$rLo`) div ${binWidth}L"))
      .drop("__bin")
  }
}
