package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-key sequential time-series passes — recurrences that windows
  * cannot express (each output depends on the previous OUTPUT, not a
  * frame of inputs), run with the secondary-sort idiom: shuffle once
  * on the key, sort within partitions by (key, order), then a single
  * streaming fold over each partition with O(1) state per group —
  * no group is ever collected, no window ever spans the corpus.
  *
  * Determinism contract: the order columns must form a TOTAL order
  * within each key (callers pass a unique tiebreak), and `alpha` must
  * be exactly representable in binary (k/2^n, e.g. 0.25) — then the
  * fold `ewma' = ewma + (x − ewma)·alpha` is a fixed sequence of
  * correctly-rounded IEEE ops and replays bit-for-bit in any engine
  * (the q121 oracle re-runs the identical recurrence as a recursive
  * CTE).
  */
object TimeSeries {

  /** Exponentially-weighted moving average per key: one row per key
    * with the FINAL smoothed value after folding that key's rows in
    * `orderCols` order, plus the fold length. Output schema:
    * (keyCols..., n_points, ewma). */
  def ewmaLast(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, alpha: Double): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "ewmaLast needs key and order columns")
    // exact-binary alpha: alpha * 2^40 must be integral, so the
    // multiply is one correctly-rounded op with no decimal-parse seam
    require(alpha > 0.0 && alpha < 1.0 &&
      (alpha * (1L << 40).toDouble) == math.rint(alpha * (1L << 40).toDouble),
      s"alpha must be a binary fraction k/2^n in (0,1), got $alpha")
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyFields = keyCols.map(c => df.schema(c))
    val outSchema = StructType(keyFields :+
      StructField("n_points", LongType, nullable = false) :+
      StructField("ewma", DoubleType, nullable = false))
    val kIdx = keyCols.map(df.schema.fieldIndex)
    val vIdx = df.schema.fieldIndex(valueCol)
    val sorted = df
      .repartition(nParts, keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val enc = RowEncoder.encoderFor(outSchema)
    sorted.mapPartitions { it =>
      new Iterator[Row] {
        private var cur: Option[(Seq[Any], Long, Double)] = None
        private var pushback: Option[Row] = None
        private def emit(s: (Seq[Any], Long, Double)): Row =
          Row.fromSeq(s._1 :+ s._2 :+ s._3)
        def hasNext: Boolean = pushback.isDefined || it.hasNext || cur.isDefined
        def next(): Row = {
          while (pushback.isDefined || it.hasNext) {
            val r = pushback.getOrElse(it.next()); pushback = None
            val key = kIdx.map(r.get)
            if (r.isNullAt(vIdx))
              throw new IllegalArgumentException(
                "ewmaLast: null value — filter nulls first (a silent " +
                  "skip would desync n_points from the fold)")
            val x = r.getDouble(vIdx)
            cur match {
              case Some((k, n, e)) if k == key =>
                cur = Some((k, n + 1, e + (x - e) * alpha))
              case Some(other) =>
                // key changed: flush the finished group; the held-back
                // row re-enters the loop and initializes the new group
                // itself (initializing HERE would fold it twice)
                pushback = Some(r)
                cur = None
                return emit(other)
              case None =>
                cur = Some((key, 1L, x))
            }
          }
          val last = cur.get; cur = None; emit(last)
        }
      }
    }(enc)
  }
}
