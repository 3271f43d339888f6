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

  test("powerIterationPc recovers a planted dominant direction") {
    import spark.implicits._
    // data = t·u + small per-dim jitter: the top eigenvector of the
    // covariance is u (up to sign)
    val dim = 8
    val u = Array.tabulate(dim)(j => math.sin(j + 1.0)).map { x =>
      val n = math.sqrt((0 until dim).map(j =>
        math.sin(j + 1.0) * math.sin(j + 1.0)).sum)
      (x / n).toFloat
    }
    val rows = (0 until 400).map { r =>
      val t = (r % 21) - 10 // spread in [-10, 10]
      Seq.tabulate(dim)(j =>
        t * u(j) + ((r * 7 + j * 13) % 11 - 5) * 0.01f)
    }
    val pc = VectorStats.powerIterationPc(rows.toDF("embedding"),
        "embedding", dim, iters = 8)
      .orderBy("dim_i").collect().map(_.getLong(1).toDouble)
    val nPc = math.sqrt(pc.map(x => x * x).sum)
    val cos = math.abs(
      pc.zip(u).map { case (a, b) => a * b }.sum) / nPc
    assert(cos >= 0.99, s"planted-direction cosine $cos; pc=" +
      pc.mkString(","))
  }

  test("powerIterationPc is bit-identical under any partitioning and matches a double-precision iteration") {
    val big = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(parts: Int) =
      VectorStats.powerIterationPc(big.repartition(parts), "embedding",
        64, iters = 5).orderBy("dim_i").collect()
        .map(_.getLong(1)).toSeq
    val a = run(1)
    assert(a == run(13))
    // double-precision reference over the same quantized moments
    val vs = big.select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        math.floor(x.toDouble * 1024 + 0.5)).toArray)
    val n = vs.length.toDouble
    val dim = 64
    val m = Array.tabulate(dim)(i => vs.map(_(i)).sum)
    val s2 = Array.tabulate(dim, dim)((i, j) =>
      vs.map(v => v(i) * v(j)).sum)
    var v = Array.tabulate(dim)(i =>
      ((i * 2654435761L) % 2039L - 1019L).toDouble)
    for (_ <- 0 until 5) {
      val mv = (0 until dim).map(j => m(j) * v(j)).sum
      val y = Array.tabulate(dim)(i =>
        n * (0 until dim).map(j => s2(i)(j) * v(j)).sum - m(i) * mv)
      val mx = y.map(math.abs).max
      v = if (mx == 0) Array.fill(dim)(0.0) else y.map(_ / mx * 1024)
    }
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nv = math.sqrt(v.map(x => x * x).sum)
    val cos = math.abs(a.zip(v).map { case (x, y) =>
      x.toDouble * y }.sum) / (na * nv)
    assert(cos >= 0.999,
      s"integer iteration diverged from the double reference: $cos")
  }

  test("powerIterationPc2 recovers two planted directions, near-orthogonal") {
    import spark.implicits._
    val dim = 8
    // two orthogonal planted directions with separated strengths
    def normed(raw: Array[Double]) = {
      val n = math.sqrt(raw.map(x => x * x).sum); raw.map(_ / n)
    }
    val u1 = normed(Array.tabulate(dim)(j => math.sin(j + 1.0)))
    val u2raw = Array.tabulate(dim)(j => math.cos(2.0 * j + 0.5))
    val proj = u1.zip(u2raw).map { case (a, b) => a * b }.sum
    val u2 = normed(u2raw.zip(u1).map { case (b, a) => b - proj * a })
    val rows = (0 until 500).map { r =>
      val t1 = (r % 21) - 10
      val t2 = ((r / 3) % 11) - 5 // weaker second direction
      Seq.tabulate(dim)(j =>
        (t1 * u1(j) + t2 * u2(j)).toFloat +
          ((r * 7 + j * 13) % 11 - 5) * 0.01f)
    }
    val out = VectorStats.powerIterationPc2(rows.toDF("embedding"),
        "embedding", dim, iters = 10)
      .orderBy("dim_i").collect()
    val pc1 = out.map(_.getLong(1).toDouble)
    val pc2 = out.map(_.getLong(2).toDouble)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.abs(a.zip(b).map { case (x, y) => x * y }.sum) / (na * nb)
    }
    assert(cos(pc1, u1) >= 0.99, s"pc1 missed u1: ${cos(pc1, u1)}")
    assert(cos(pc2, u2) >= 0.98, s"pc2 missed u2: ${cos(pc2, u2)}")
    assert(cos(pc1, pc2) <= 0.05,
      s"pc1/pc2 not orthogonal: ${cos(pc1, pc2)}")
  }

  test("pcProjectionMap: hand-checked buckets, floor binning on negatives") {
    import spark.implicits._
    // quantized vectors are floor(v*1024+0.5); choose v so q is exact:
    // v = 1.0 -> q = 1024, v = -1.0 -> q = -1024
    val rows = Seq(
      Seq(1f, 0f),   // q = (1024, 0)    proj1 = 1024, proj2 = 0
      Seq(-1f, 0f),  // q = (-1024, 0)   proj1 = -1024
      Seq(0f, 1f),   // q = (0, 1024)    proj2 = 1024
      Seq(0f, 0f))
    // pc1 = (1, 0), pc2 = (0, 1), width 1000:
    // proj1 buckets: floor(1024/1000)=1, floor(-1024/1000)=-2 (FLOOR,
    // not truncation), 0, 0; proj2: 0, 0, 1, 0
    val got = VectorStats.pcProjectionMap(rows.toDF("embedding"),
        "embedding", Seq(1L, 0L), Seq(0L, 1L), bucketWidth = 1000L)
      .orderBy("b1", "b2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((-2L, 0L, 1L), (0L, 0L, 1L), (0L, 1L, 1L),
      (1L, 0L, 1L)), s"got $got")
  }

  test("principal directions from MAINTAINED cells equal a fresh corpus recompute") {
    import spark.implicits._
    def vec(i: Long, salt: Int): Seq[Float] =
      (0 until 6).map(j => ((i * 37 + j * 11 + salt * 17) % 89) / 89f)
    val snapA = (0L until 150L).map(i => vec(i, 0))
    val removed = (0L until 150L).filter(_ % 7 == 0).map(i => vec(i, 0))
    val added = (150L until 190L).map(i => vec(i, 1))
    val snapB = (0L until 150L).filterNot(_ % 7 == 0).map(i =>
      vec(i, 0)) ++ added
    val maintainedCells = VectorStats.momentsMaintained(
      VectorStats.moments(snapA.toDF("embedding"), "embedding"),
      added.toDF("embedding"), removed.toDF("embedding"), "embedding")
    val fromMaintained = VectorStats.powerIterationPcFromCells(spark,
        maintainedCells, dim = 6, iters = 5)
      .orderBy("dim_i").collect().map(_.toSeq).toSeq
    val fresh = VectorStats.powerIterationPc(snapB.toDF("embedding"),
        "embedding", dim = 6, iters = 5)
      .orderBy("dim_i").collect().map(_.toSeq).toSeq
    assert(fromMaintained == fresh,
      "PCA from maintained cells diverged from the fresh corpus")
  }

  test("momentsMaintained after append+delete is bit-identical to a fresh recompute") {
    import spark.implicits._
    def vec(i: Long, salt: Int): Seq[Float] =
      (0 until 6).map(j => ((i * 31 + j * 7 + salt * 13) % 97) / 97f)
    val snapA = (0L until 200L).map(i => vec(i, 0))
    val removed = (0L until 200L).filter(_ % 9 == 0).map(i => vec(i, 0))
    val added = (200L until 230L).map(i => vec(i, 1))
    val snapB = (0L until 200L).filterNot(_ % 9 == 0).map(i =>
      vec(i, 0)) ++ added
    val old = VectorStats.moments(snapA.toDF("embedding"), "embedding")
    val maintained = VectorStats.momentsMaintained(old,
        added.toDF("embedding"), removed.toDF("embedding"), "embedding")
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    val fresh = VectorStats.moments(snapB.toDF("embedding"), "embedding")
      .orderBy("i", "j").collect().map(_.toSeq).toSeq
    assert(maintained == fresh)
  }

  test("momentsMaintained refuses a CDC batch whose vector dim differs from the cells'") {
    import spark.implicits._
    val old = VectorStats.moments(
      (0L until 50L).map(i => (0 until 6).map(j =>
        ((i * 31 + j * 7) % 97) / 97f)).toDF("embedding"), "embedding")
    val wrongDim = (0L until 10L).map(i => (0 until 7).map(j =>
      ((i * 31 + j * 7) % 97) / 97f)).toDF("embedding")
    val ex = intercept[Exception] {
      VectorStats.momentsMaintained(old, wrongDim,
        spark.emptyDataset[Seq[Float]].toDF("embedding"), "embedding")
        .collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("dim"),
      s"wrong failure: ${ex.getMessage}")
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
