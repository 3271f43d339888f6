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
