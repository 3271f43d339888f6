package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weight-proportional sampling at corpus scale —
  * systematic (fixed-interval) sampling over the cumulative weight
  * line, the classic survey-sampling design (Madow 1949) and the way a
  * training pipeline draws a token-budget-proportional subcorpus
  * WITHOUT an RNG: sampling probability is exactly proportional to
  * weight, the draw is reproducible from the data alone, and a re-run
  * over a re-partitioned corpus returns the identical sample.
  *
  * Selection rule: order rows by `idCol`; with `W = Σ weight` and `k`
  * slots, row i (cumulative weight cum_i, previous cum p_i) is selected
  * with multiplicity `(cum_i·k) div W − (p_i·k) div W` — the number of
  * of the k evenly-spaced thresholds its weight interval covers. All
  * long arithmetic (IntegralDivide, no step rounding): multiplicities
  * sum to exactly k, a row wider than one stride gets multiplicity > 1,
  * and every engine lands on the same bits. Caller contract:
  * `idCol` is UNIQUE (the order must be total, or tied rows' cumulative
  * positions — and hence the sample — depend on layout), `weight ≥ 1`
  * (zero-weight rows must be filtered first — they can never be
  * selected and only stretch the id sort) and `W·k < 2^63` (a 100-TB
  * corpus of 10^14 total weight leaves room for k ≤ 10^4).
  *
  * Scale shape — the global cumulative sum WITHOUT a single-partition
  * window: range-partition by id, per-partition window cumsum, then a
  * PARTITION-COUNT-sized collect of per-partition totals whose prefix
  * offsets broadcast back as a join on partition id. The corpus
  * shuffles once (the range partitioning); no executor ever orders
  * more than its own partition.
  */
object Sampler {

  /** Rows selected by weighted systematic sampling, with their slot
    * multiplicity: original columns + `slots` (≥ 1). */
  def systematicWeighted(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df
      .repartitionByRange(nParts, col(idCol))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // FROZEN once (eager localCheckpoint): the per-partition cumsum is
    // read by two downstream consumers (the offset collect and the
    // final join), and re-evaluating it would re-run
    // repartitionByRange, whose sampled boundaries need not land the
    // same rows in the same partitions twice — the offsets from one
    // evaluation would then be applied to the OTHER evaluation's
    // partition ids (observed as a wrong sample at sf0.1)
    val withCum = parted
      .withColumn("__w", col(weightCol).cast("long"))
      .withColumn("__cum_local", sum(col("__w")).over(wLocal))
      .localCheckpoint()
    // partition totals: a collect bounded by the partition COUNT (the
    // one driver-side structure this operator owns), never by rows
    val partSums = withCum.groupBy(col("__pid"))
      .agg(max(col("__cum_local")).as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = partSums.values.sum
    require(total >= 1, "systematicWeighted needs positive total weight")
    require(total <= Long.MaxValue / k,
      s"W*k overflows long: W=$total k=$k")
    val offsets = {
      val sorted = partSums.toSeq.sortBy(_._1)
      val off = sorted.scanLeft(0L)(_ + _._2).dropRight(1)
      sorted.map(_._1).zip(off).toMap
    }
    val offFrame = broadcast(
      spark.createDataFrame(offsets.toSeq.map(p => (p._1, p._2)))
        .toDF("__pid", "__off"))
    withCum.join(offFrame, "__pid")
      .withColumn("__cum", col("__cum_local") + col("__off"))
      .withColumn("slots", expr(
        s"((__cum * $k) div ${total}L) - (((__cum - __w) * $k) div ${total}L)"))
      .filter(col("slots") >= 1)
      .drop("__pid", "__w", "__cum_local", "__off", "__cum")
  }
}
