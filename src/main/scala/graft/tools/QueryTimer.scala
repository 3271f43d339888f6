package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query end-to-end, N times:
  * `run_main.sh graft.tools.QueryTimer <sfDir> <queryName> [reps]`.
  * Prints per-rep seconds — the per-query magnifier for
  * [[graft.Bench]], for drilling into one slow query without paying
  * for the whole board. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-query-timer")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      val t2 = System.nanoTime()
      println(f"rep $i: build ${(t1 - t0) / 1e9}%.3f s + " +
        f"materialize ${(t2 - t1) / 1e9}%.3f s")
      if (sys.env.contains("GRAFT_TIMER_PLAN") && i == 1)
        System.err.println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
