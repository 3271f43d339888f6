package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.plans.VectorExpressions

/** Micro-benchmark: HOF (zip_with/aggregate) vs native codegen'd
  * expressions on a full-corpus distance scan. Run:
  * `scripts/run_main.sh graft.tools.DistanceBench [sfDir] [reps]`.
  * Informs which form the hot KNN paths should use (VERDICT r2 item 10).
  */
object DistanceBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorExpressions.ensureRegistered(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    emb.count() // materialize cache
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val qv = array(q.map(x => lit(x)): _*)

    def time(name: String, df: => DataFrame): Unit = {
      df.queryExecution.toRdd.foreach(_ => ()) // warm up
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e6
      }.min
      println(f"$name%-14s $best%9.1f ms (min of $reps)")
    }

    time("l2 HOF", emb.select(l2Distance(col("embedding"), qv)))
    time("l2 native", emb.select(l2DistanceNative(col("embedding"), qv)))
    time("dot HOF", emb.select(dotProduct(col("embedding"), qv)))
    time("dot native", emb.select(dotProductNative(col("embedding"), qv)))
    time("cos HOF", emb.select(cosineSimilarity(col("embedding"), qv)))
    time("cos native", emb.select(cosineSimilarityNative(col("embedding"), qv)))
    spark.stop()
  }
}
