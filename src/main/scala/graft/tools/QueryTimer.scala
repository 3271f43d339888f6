package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query end-to-end, N times:
  * `run_main.sh graft.tools.QueryTimer <sfDir> <queryName> [reps]`.
  * Prints per-rep build (driver-side plan construction — for iterative
  * operators like q55 this includes their eager jobs) and materialize
  * seconds. The session mirrors [[graft.Bench]] exactly (same
  * SPARK_GRAFT_CPUS default, shuffle partitions, AQE, timezone) so the
  * numbers are comparable to the board this magnifies. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: QueryTimer <sfDir> <queryName> [reps]\n" +
          s"queries: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val fn = graft.SparkEntry.queries.getOrElse(name, {
      System.err.println(s"unknown query '$name'; known: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    })
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .appName("graft-query-timer")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
