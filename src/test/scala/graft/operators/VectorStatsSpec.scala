package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[VectorStats]] — exact-integer covariance moments: hand-checked
  * values, layout invariance, and the single-shuffle plan shape. */
class VectorStatsSpec extends SparkSpec {
  import spark.implicits._

  // 4 rows × 3 dims; dim0 == dim1 (perfect correlation), dim2 constant
  private def df = Seq(
    Seq(1f, 1f, 5f), Seq(2f, 2f, 5f), Seq(3f, 3f, 5f), Seq(4f, 4f, 5f)
  ).toDF("embedding")

  test("moments match hand-computed integer sums") {
    val m = VectorStats.moments(df, "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .toMap
    val q = Seq(1024L, 2048L, 3072L, 4096L) // floor(v*1024+0.5)
    assert(m((-1, -1)) == 4L)
    assert(m((0, -1)) == q.sum)
    assert(m((2, -1)) == 4L * 5120L)
    assert(m((0, 0)) == q.map(x => x * x).sum)
    assert(m((0, 1)) == q.map(x => x * x).sum) // dim1 == dim0
    assert(m((0, 2)) == q.map(_ * 5120L).sum)
  }

  test("identical dims correlate at exactly 1.0; constant dims have zero covariance") {
    val r = VectorStats.topCovariantPairs(df, "embedding", k = 3)
      .collect().map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2),
          if (x.isNullAt(3)) None else Some(x.getDouble(3))))).toMap
    assert(r((0L, 1L))._2.contains(1.0), s"corr(0,1): ${r((0L, 1L))}")
    assert(r((0L, 2L))._1 == 0L) // covariance with a constant dim
    assert(r((0L, 2L))._2.isEmpty,
      "zero-variance dim must yield NULL correlation")
    // cov(0,1) = n·Σq² − (Σq)² with the hand values
    val q = Seq(1024L, 2048L, 3072L, 4096L)
    assert(r((0L, 1L))._1 == 4L * q.map(x => x * x).sum - q.sum * q.sum)
  }

  test("the mapPartitions fold is bit-equal to the explode cross-check spelling") {
    val big = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .repartition(7)
    val fast = VectorStats.moments(big, "embedding")
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    val ref = VectorStats.momentsExploded(big, "embedding")
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    assert(fast == ref)
  }

  test("moments rejects mixed vector dims loudly") {
    import spark.implicits._
    val mixed = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("embedding")
      .repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      VectorStats.moments(mixed, "embedding").collect()
    }
    assert(e.getMessage.contains("mixed vector dims") ||
      Option(e.getCause).exists(_.getMessage.contains("mixed vector dims")))
  }

  test("moments rejects mixed dims ACROSS partitions (the per-partition latch cannot see them)") {
    import spark.implicits._
    // each dim in its own partition: the in-partition require never
    // fires, only the cross-partition marker tripwire can catch this
    val p1 = Seq(Seq(1f, 2f)).toDF("embedding").repartition(1)
    val p2 = Seq(Seq(1f, 2f, 3f)).toDF("embedding").repartition(1)
    val mixed = p1.union(p2)
    val e = intercept[Throwable] {
      VectorStats.moments(mixed, "embedding").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("mixed vector dims")),
      s"wrong failure: $e")
    // the exploded spelling trips the same wire
    val e2 = intercept[Throwable] {
      VectorStats.momentsExploded(mixed, "embedding").collect()
    }
    assert(msgs(e2).exists(_.contains("mixed vector dims")),
      s"wrong failure: $e2")
  }

  test("moments are bit-identical under any partitioning") {
    val big = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    def m(parts: Int) =
      VectorStats.moments(big.repartition(parts), "embedding")
        .orderBy("i", "j").collect().map(_.toSeq).toSeq
    assert(m(1) == m(13))
  }

  test("one corpus scan, one pairs-sized shuffle (map-side combine)") {
    val plan = VectorStats.moments(df, "embedding")
      .queryExecution.executedPlan.toString
    // exactly two Exchanges: the cells-keyed shuffle fed by a partial
    // aggregate (the ONE corpus-scale exchange), plus the dim-tripwire
    // window's SinglePartition exchange over the already cells-sized
    // frame
    assert("Exchange".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("SinglePartition"),
      s"dim tripwire window missing:\n$plan")
    assert(plan.contains("partial"), s"no map-side partial agg:\n$plan")
  }

  test("dimStandardization: hand-checked mean/std, zero-variance std is 0") {
    val r = VectorStats.dimStandardization(df, "embedding")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    // dim0 values 1..4: mean 2.5, population std = sqrt(1.25)
    assert(r(0L)._1 == 4L)
    assert(math.abs(r(0L)._2 - 2.5) < 1e-6)
    assert(math.abs(r(0L)._3 - math.sqrt(1.25)) < 1e-5)
    // dim2 constant 5: mean 5, std exactly 0
    assert(math.abs(r(2L)._2 - 5.0) < 1e-6)
    assert(r(2L)._3 == 0.0)
  }

  test("null vectors are skipped, not crashed on") {
    val withNull = Seq(Some(Seq(1f, 2f)), None, Some(Seq(3f, 4f)))
      .toDF("embedding")
    val m = VectorStats.moments(withNull, "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .toMap
    assert(m((-1, -1)) == 2L)
  }
}
