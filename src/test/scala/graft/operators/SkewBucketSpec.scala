package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewBucketSpec extends SparkSpec {

  test("salted join returns exactly the plain join result") {
    import spark.implicits._
    // skewed: key 1 is hot on the big side, dup keys on both sides
    val big = (Seq.fill(500)(1) ++ (2 to 50) ++ Seq(2, 2)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"), (99, "x"))
      .toDF("sk", "name")
    val salted = SkewJoin.saltedJoin(big, small, "k", "sk", salt = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "payload", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("AQE splits the skewed partition of a sort-merge join (skew=true), result unchanged") {
    import spark.implicits._
    // the runtime half of the skew story: saltedJoin is the STATIC
    // remedy (above); AQE's skew-join split is the engine-native one
    // the 100 TB plan notes lean on — prove this session's engine
    // actually performs it. One hot key carries ~99% of the big side,
    // so its post-shuffle partition dwarfs the threshold and the
    // final adaptive plan must mark the join skew=true and still
    // return exactly the plain join's rows.
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val big = (1 to 20000)
        .map(i => (if (i % 100 == 0) i.toLong else 1L, i.toLong))
        .toDF("k", "payload")
      val right = (1L to 200L).map(k => (k, s"n$k")).toDF("rk", "name")
      val joined = big.join(right, col("k") === col("rk"))
      // execute THIS frame (count() would plan a separate query and
      // leave joined's adaptive plan un-finalized)
      val rows = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join, got:\n$plan")
      // plain (AQE-off) reference count: hot key 1 matches 1 right
      // row, every i%100==0 key <= 200 matches one
      val expect = 19800L + (1 to 20000).count(i =>
        i % 100 == 0 && i <= 200)
      assert(rows == expect, s"skew-split join returned $rows rows")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables co-locate the join (no shuffle exchange)") {
    val dir = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      spark.read.parquet(s"$dir/customer.parquet")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides bucketed on the join key with equal bucket counts:
      // the sort-merge join reads buckets directly — no Exchange
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
