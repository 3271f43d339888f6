package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Scale probe for [[IvfIndex.rebalance]]'s central claim: the repair
  * touches ONLY oversized cells — per split one cell-scoped k-means fit
  * plus a narrow reassignment write of that cell's rows — so its cost
  * tracks the OVERSIZED FRACTION of the corpus, never the corpus. The
  * q221 gate proves correctness; this measures the cost shape so
  * PLANS.md records a number instead of a docstring hope. Three runs
  * over the same corpus (sf dir embeddings, arg 1, default sf0.1):
  *
  *   - one-cell:  nlist=8 root, maxCellRows chosen so exactly ONE cell
  *     is oversized — the incremental-repair case;
  *   - all-cells: the same root at maxCellRows = n/32 — every cell
  *     splits, the worst case, bounded below by one corpus rewrite;
  *   - rebuild:   IvfIndex.build + write from scratch — the
  *     alternative the one-cell repair must beat.
  *
  * Prints per-run wall seconds and rows rewritten. Run:
  * `scripts/run_main.sh graft.tools.RebalanceScaleBench [sfDir]`. */
object RebalanceScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val n = emb.count()

    def freshRoot(tag: String): String = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft-rebalbench-$tag-").toString + "/ivf"
      IvfIndex.build(emb, "vec_id", "embedding", nlist = 8).write(p)
      p
    }
    def sizes(p: String): Array[Long] =
      spark.read.parquet(p).groupBy(col(IvfIndex.ClusterCol)).count()
        .collect().map(_.getLong(1)).sorted.reverse

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // one-cell: threshold strictly between the largest and
    // second-largest cell (largest-1 when they tie — then the tied
    // peers split too, reported honestly via `splits`)
    val p1 = freshRoot("one")
    val s1 = sizes(p1)
    val oneCellMax = if (s1(0) > s1(1)) s1(1) else s1(0) - 1
    val rewritten1 = s1.filter(_ > oneCellMax).sum
    val (splits1, t1) = timed(IvfIndex.rebalance(spark, p1, "vec_id",
      "embedding", maxCellRows = oneCellMax))
    println(f"one-cell   n=$n%8d rewritten=$rewritten1%8d " +
      f"splits=$splits1%3d  t=$t1%7.2f s")

    // all-cells: everything splits (2-way — the per-split driver
    // k-means + write job is the unit cost this bench counts)
    val p2 = freshRoot("all")
    val (splits2, t2) = timed(IvfIndex.rebalance(spark, p2, "vec_id",
      "embedding", maxCellRows = math.max(1L, n / 16)))
    println(f"all-cells  n=$n%8d rewritten=$n%8d " +
      f"splits=$splits2%3d  t=$t2%7.2f s")

    // rebuild from scratch — the alternative the repair must beat
    val (_, t3) = timed {
      val p = java.nio.file.Files
        .createTempDirectory("graft-rebalbench-rebuild-")
        .toString + "/ivf"
      IvfIndex.build(emb, "vec_id", "embedding", nlist = 8).write(p)
    }
    println(f"rebuild    n=$n%8d rewritten=$n%8d " +
      f"splits=  -  t=$t3%7.2f s")
    println(f"one-cell repair vs rebuild: ${t3 / t1}%.1fx faster; " +
      f"rows touched ${rewritten1 * 100.0 / n}%.0f%% of corpus")
    spark.stop()
  }
}
