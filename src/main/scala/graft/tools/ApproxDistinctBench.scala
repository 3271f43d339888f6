package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.ApproxDistinctRewrite

/** Measure [[graft.plans.ApproxDistinctRewrite]]'s shuffle win: exact
  * `count(DISTINCT x)` vs the HLL-rewritten plan over a synthetic
  * high-cardinality frame (N rows, ~N/5 distinct string keys, 8
  * groups). The exact form shuffles every distinct (group, key) pair;
  * the rewrite shuffles ≤ 8·m register rows. Run:
  * `scripts/run_main.sh graft.tools.ApproxDistinctBench [N...]`
  * (default 2000000 10000000). Prints per-N wall times + the
  * estimates so the error is visible next to the speedup. */
object ApproxDistinctBench {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(2000000L, 10000000L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite(spark)

    def frame(n: Long) = spark.range(n)
      .select((col("id") % 8).as("g"),
        md5(concat_ws(":", lit("k"), (col("id") % (n / 5)))).as("x"))

    def timed(tag: String, n: Long)(f: => Array[(Long, Long)]): Unit = {
      f // warm-up
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      val total = rows.map(_._2).sum
      println(f"$tag%-8s n=$n%9d  ${secs}%6.2f s  sum_estimates=$total")
    }

    sizes.foreach { n =>
      timed("exact", n) {
        frame(n).groupBy("g").agg(count_distinct(col("x")).as("nd"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      spark.conf.set(ApproxDistinctRewrite.MConf, "256")
      try timed("hll-256", n) {
        frame(n).groupBy("g").agg(count_distinct(col("x")).as("nd"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      } finally spark.conf.unset(ApproxDistinctRewrite.MConf)
    }
    spark.stop()
  }
}
