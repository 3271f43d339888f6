package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ranker]] — the two-phase global ranking must be
  * indistinguishable from Spark's single-partition window: ranks,
  * ntile buckets (the SQL-standard uneven split), percent_rank, and
  * cume_dist all agree bit-for-bit, across layouts and awkward
  * (n, k) shapes. */
class RankerSpec extends SparkSpec {
  import spark.implicits._

  private def data(n: Int) =
    (0 until n).map(i => ((i * 37 % 1009).toLong * 1000 + i, i.toLong))
      .toDF("v", "id")

  test("rank / ntile / percent_rank / cume_dist match the window reference, including n < k and n % k != 0") {
    for ((n, k) <- Seq((200, 4), (201, 4), (7, 10), (1, 3), (100, 7))) {
      val df = data(n)
      val w = Window.orderBy(col("v"), col("id"))
      val ref = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("ntile_bucket", ntile(k).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .collect().map(r => (r.getLong(1), (r.getLong(2), r.getInt(3),
          r.getDouble(4), r.getDouble(5)))).toMap
      val got = Ranker.globalDistribution(df.repartition(9),
          Seq("v", "id"), k)
        .collect().map(r => (r.getLong(1), (r.getLong(2), r.getInt(3),
          r.getDouble(4), r.getDouble(5)))).toMap
      assert(got.keySet == ref.keySet)
      got.foreach { case (id, t) =>
        val rt = ref(id)
        assert(t._1 == rt._1 && t._2 == rt._2,
          s"n=$n k=$k id=$id: rank/bucket $t vs $rt")
        assert(java.lang.Double.doubleToRawLongBits(t._3) ==
          java.lang.Double.doubleToRawLongBits(rt._3), s"pct_rank $t vs $rt")
        assert(java.lang.Double.doubleToRawLongBits(t._4) ==
          java.lang.Double.doubleToRawLongBits(rt._4), s"cume $t vs $rt")
      }
    }
  }

  test("ranks are a permutation of 1..N and layout-invariant") {
    val df = data(500)
    def ranks(parts: Int): Map[Long, Long] =
      Ranker.globalRanks(df.repartition(parts), Seq("v", "id"))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val r1 = ranks(1)
    assert(r1.values.toSeq.sorted == (1L to 500L), "not a permutation")
    assert(r1 == ranks(13), "ranks moved with input layout")
  }
}
