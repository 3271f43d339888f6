package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** Scale probe for [[NearDup.duplicateClusters]]'s rep-join hot key
  * (NearDup.scala viaReps: every member of a cluster joins on the same
  * `rep` value, so one giant cluster is one hot join key). The 10⁴-star
  * stress spec passes on AQE's skew handling alone; this tool measures
  * the documented escalation threshold at 10⁵–10⁶ members so PLANS.md
  * can record a NUMBER instead of a hope. Run:
  * `scripts/run_main.sh graft.tools.ClusterScaleBench [sizes...]`
  * (default 100000 300000 1000000). Shapes per size:
  *   - star-N:  one hub ↔ N members — the pure hot-key worst case
  *     (converges in ~2 rounds; stresses join skew, not the loop);
  *   - chain-N: a length-N path — the convergence worst case
  *     (O(log N) pointer-jumping rounds; stresses round count at size).
  * Prints per-round wall times (GRAFT_CLUSTER_DEBUG) + totals.
  */
object ClusterScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(100000, 300000, 1000000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def run(name: String, n: Int)(pairs: => org.apache.spark.sql.DataFrame)
        : Unit = {
      val t0 = System.nanoTime()
      val out = NearDup.duplicateClusters(pairs)
      val nClusters = out.select(countDistinct(col("cluster_rep"))).head()
        .getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name%-14s n=$n%8d  total=$secs%7.2f s  clusters=$nClusters")
      assert(nClusters == 1, s"$name must converge to one cluster")
    }

    sizes.foreach { n =>
      run(s"star-$n", n)(
        spark.range(1, n.toLong + 1)
          .select(lit(0L).as("a_id"), col("id").as("b_id")))
      run(s"chain-$n", n)(
        spark.range(0, n.toLong - 1)
          .select(col("id").as("a_id"), (col("id") + 1).as("b_id")))
    }
    spark.stop()
  }
}
