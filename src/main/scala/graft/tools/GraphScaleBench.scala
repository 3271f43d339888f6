package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Scale probe for [[Graph.pageRankPpb]] — the two shapes that decide
  * whether an iterative rank loop survives 100 TB:
  *
  *   - ring-N: a 2-regular mirrored graph (every node degree 4) — the
  *     uniform baseline; per-hop cost should scale linearly with edge
  *     count and stay flat across hops (the localCheckpoint contract:
  *     no lineage re-derivation, hop i costs the same as hop 1);
  *   - star-N: N spokes all pointing at ONE hub (plus the mirror) —
  *     the hot-key worst case. The in-mass aggregation partial-folds
  *     per partition before the shuffle, so the hub receives
  *     nPartitions pre-summed rows, not N — the reason one celebrity
  *     node does not serialize the hop.
  *
  * Run: `scripts/run_main.sh graft.tools.GraphScaleBench [sizes...]`
  * (default 100000 1000000). Prints per-shape totals and per-hop
  * deltas; PLANS.md records the numbers.
  */
object GraphScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(100000, 1000000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, edges: org.apache.spark.sql.DataFrame,
        hops: Int): Unit = {
      val t0 = System.nanoTime()
      val ranks = Graph.pageRankPpb(edges, "a", "b", hops)
      val total = ranks.agg(sum(col("rank_ppb"))).head().getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name%-14s hops=$hops%2d  total=$secs%7.2f s  mass=$total")
    }

    sizes.foreach { n =>
      val ring = spark.range(0, n.toLong)
        .select(col("id").as("a"), ((col("id") + 1) % n).as("b"))
        .union(spark.range(0, n.toLong)
          .select(((col("id") + 1) % n).as("a"), col("id").as("b")))
      run(s"ring-$n", ring, 3)
      run(s"ring-$n", ring, 6)
      val star = spark.range(1, n.toLong)
        .select(col("id").as("a"), lit(0L).as("b"))
        .union(spark.range(1, n.toLong)
          .select(lit(0L).as("a"), col("id").as("b")))
      run(s"star-$n", star, 3)
    }
    spark.stop()
  }
}
