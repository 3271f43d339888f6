package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable GLOBAL ranking — the two-phase form of
  * `Window.orderBy(...)` with no partition key, which Spark executes
  * as a SINGLE-partition window (its own warning says so): fine for a
  * report frame, a wall at a 10⁹-row one. Here the corpus
  * range-partitions on the order columns, each partition numbers its
  * own rows, and a PARTITION-COUNT-sized collect of per-partition
  * counts broadcasts back as rank offsets — the same frozen-once
  * offset pattern as [[Sampler.systematicWeighted]] (and the same
  * hazard: the partitioned frame takes an eager localCheckpoint so
  * the offsets are never applied to a re-evaluated, re-sampled
  * partitioning).
  *
  * Contract: `orderCols` must form a TOTAL order (pass a unique
  * tiebreak) — with ties the per-partition numbering would depend on
  * layout. Under that contract row_number = rank = dense_rank, and
  * the derived distribution columns are exact:
  *
  *   - `ntile(k)`: the SQL-standard uneven split (first N mod k
  *     buckets take one extra row) in pure integer arithmetic;
  *   - `percent_rank` = (rank−1)/(N−1) (0 when N = 1);
  *   - `cume_dist` = rank/N;
  *
  * both doubles are single divisions of exact longs — engine-exact,
  * and spec-pinned equal to Spark's own window functions. */
object Ranker {

  /** Input columns + `rank` (1-based, dense, global). */
  def globalRanks(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "globalRanks needs order columns")
    val spark = df.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df
      .repartitionByRange(nParts, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)))
      .localCheckpoint()
    val counts = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = {
      val sorted = counts.toSeq.sortBy(_._1)
      val off = sorted.scanLeft(0L)(_ + _._2).dropRight(1)
      sorted.map(_._1).zip(off).toMap
    }
    val offFrame = broadcast(
      spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off"))
    parted.join(offFrame, "__pid")
      .withColumn("rank", col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }

  /** [[globalRanks]] + the derived distribution columns
    * (`ntile_bucket`, `pct_rank`, `cume`) for a k-way split. */
  def globalDistribution(df: DataFrame, orderCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ranked = globalRanks(df, orderCols)
    // N is partition-count-sized knowledge already; one tiny agg
    val n = ranked.agg(count(lit(1))).head().getLong(0)
    val q = n / k
    val r = n % k
    // SQL-standard NTILE: the first r buckets hold q+1 rows
    val bucket =
      if (q == 0L) col("rank") // more buckets than rows: bucket = rank
      else when(col("rank") <= lit(r * (q + 1)),
          expr(s"(rank + ${q}L) div ${q + 1}L"))
        .otherwise(lit(r) + expr(s"(rank - ${r * (q + 1)}L + ${q - 1}L) div ${q}L"))
    ranked
      .withColumn("ntile_bucket", bucket.cast("int"))
      .withColumn("pct_rank",
        if (n <= 1L) lit(0.0)
        else (col("rank") - lit(1L)).cast("double") / lit((n - 1).toDouble))
      .withColumn("cume",
        col("rank").cast("double") / lit(n.toDouble))
  }
}
