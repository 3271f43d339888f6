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
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
      // drops and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others —
      // normalize BOTH to TimestampType so every downstream window/
      // sessionize query sees one type regardless of the generator's
      // pyarrow version.
      //  - NANOS: Spark's reader rejects it outright; nanosAsLong reads
      //    it as epoch-nanos long, converted here with integral `div`
      //    (not `/`: epoch nanos ≈ 1.7e18 exceed double's 53-bit
      //    mantissa). DELIBERATE session-wide side effect: nanosAsLong
      //    stays set after this call (restoring it would break the lazy
      //    scan at execution time).
      //  - MICROS non-UTC: arrives as TIMESTAMP_NTZ; under the
      //    session's pinned UTC zone the cast to TimestampType keeps
      //    every wall value = the same UTC instant the nanos form
      //    produced, so query results are identical across drops.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register all tables as temp views so `spark.sql` mirrors the DuckDB
    * oracle's view of the world. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
