package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main. Prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Methodology (fixes the round-2 harness defects called out in VERDICT.md):
  *   - one untimed warm-up pass per query (absorbs SparkSession/JIT/IO-cache
  *     startup that previously charged ~7s to whichever query ran first);
  *   - timed min-of-3 per query (min, not mean: we measure the engine, not
  *     the noise);
  *   - materialization via `queryExecution.toRdd` foreach-noop so every
  *     projected column is actually computed — `df.count()` lets Catalyst
  *     prune expression-heavy projections to nothing;
  *   - a failing query is reported as `-1` with an `"errors"` map entry, and
  *     its failure never silently improves the total.
  */
object Bench {

  private def materialize(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        materialize(fn(spark, sfDir)) // warm-up, untimed
        val best = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          materialize(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }.min
        times(name) = best
      } catch {
        case e: Throwable =>
          times(name) = -1.0
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
    }
    val ok = times.collect { case (_, v) if v >= 0 => v }
    val total = if (ok.nonEmpty) ok.sum else 0.0
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    val qs = times.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.4f",
        Double.box(v))
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
