package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Print the physical plan of each query (or those named as args) and
  * flag scale red-flags: cartesian products, unfiltered scans feeding
  * joins, missing pushdown. `scripts/run_main.sh graft.tools.PlanAudit
  * [sfDir] [q...]`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val flags = Seq(
          "CARTESIAN" -> plan.contains("Cartesian"),
          "NESTED_LOOP" -> plan.contains("BroadcastNestedLoop"))
          .collect { case (f, true) => f }
        println(s"=== $name ${if (flags.nonEmpty) flags.mkString("[", ",", "]") else ""}")
        println(plan.linesIterator.take(40).mkString("\n"))
        println()
      }
    spark.stop()
  }
}
