package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are lazy scans; Catalyst
  * pushes filters/projections down to the parquet reader, so callers should
  * filter/select on the returned DataFrame rather than collecting.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
      // rejects; read it as epoch-nanos long and convert. Integral `div`
      // (not `/`): epoch nanos ≈ 1.7e18 exceed double's 53-bit mantissa.
      // DELIBERATE session-wide side effect: nanosAsLong stays set after
      // this call (restoring it would break the lazy scan at execution
      // time). Any later nanos-parquet read in the session also arrives
      // as long.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register all tables as temp views so `spark.sql` mirrors the DuckDB
    * oracle's view of the world. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
