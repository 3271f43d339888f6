package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketches

/** [[ApproxDistinctRewrite]] — the opt-in count(DISTINCT) → HLL
  * rewrite: fires only under the flag and only on its exact shape,
  * reproduces the Sketches pipeline bit-for-bit, and leaves every
  * non-matching aggregate untouched. */
class ApproxDistinctRewriteSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    // imperative registration (the declarative path is GraftExtensions);
    // the rule no-ops without its conf, so the shared session is safe
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[ApproxDistinctRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite(spark)
  }

  private def withFlag[A](m: Int)(f: => A): A = {
    spark.conf.set(ApproxDistinctRewrite.MConf, m.toString)
    try f finally spark.conf.unset(ApproxDistinctRewrite.MConf)
  }

  private val df = (0 until 3000)
    .map(i => (s"g${i % 3}", s"v${i % (701 + i % 3)}"))
    .toDF("g", "x")

  /** driver-side replay of the register fold — every partial sum is a
    * multiple of 2^-33 with ≤ 41 mantissa bits, so this double
    * arithmetic is order-independent and bit-equal to the plan's */
  private def expected(m: Int): Map[String, Long] = {
    val regs = Sketches.hllRegisters(df, col("x"), Seq("g"), m)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    regs.groupBy(_._1).map { case (g, rs) =>
      val present = rs.length.toLong
      val hsum = rs.map(r => 1.0 / (1L << r._3).toDouble).sum
      val est = ApproxDistinctRewrite.AlphaFor(m) * (m.toLong * m).toDouble /
        ((m - present).toDouble + hsum)
      g -> math.floor(est + 0.5).toLong
    }
  }

  test("rewrites grouped count(DISTINCT) to the HLL estimate, bit-equal to the Sketches pipeline") {
    for (m <- Seq(32, 64)) {
      val got = withFlag(m) {
        df.groupBy("g").agg(count_distinct(col("x")).as("nd"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      assert(got == expected(m), s"m=$m: $got vs ${expected(m)}")
      // and the estimate is inside the ~1.04/sqrt(m) envelope (4 sigma)
      val exact = df.groupBy("g").agg(count_distinct(col("x")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      got.foreach { case (g, e) =>
        assert(math.abs(e - exact(g)).toDouble / exact(g) <
          4.2 / math.sqrt(m.toDouble), s"m=$m g=$g: $e vs ${exact(g)}")
      }
    }
  }

  test("global (ungrouped) count(DISTINCT) rewrites too; flag off means exact") {
    val exact = df.agg(count_distinct(col("x"))).head().getLong(0)
    val approx = withFlag(64) {
      df.agg(count_distinct(col("x")).as("nd")).head().getLong(0)
    }
    assert(approx != exact,
      "estimate landed exactly on the true count — suspicious for 700+ distinct")
    assert(math.abs(approx - exact).toDouble / exact < 0.5)
    assert(df.agg(count_distinct(col("x"))).head().getLong(0) == exact,
      "flag unset must stay exact")
  }

  test("non-matching shapes pass through exact: extra aggregate, filter clause, unsupported m") {
    val exact = df.groupBy("g")
      .agg(count_distinct(col("x")).as("nd"), sum(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val underFlag = withFlag(64) {
      df.groupBy("g")
        .agg(count_distinct(col("x")).as("nd"), sum(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    assert(underFlag == exact, "a two-aggregate frame must not rewrite")
    val filtered = withFlag(64) {
      df.groupBy("g")
        .agg(expr("count(DISTINCT x) FILTER (WHERE x <> 'v0')").as("nd"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    val filteredExact = df.groupBy("g")
      .agg(expr("count(DISTINCT x) FILTER (WHERE x <> 'v0')").as("nd"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(filtered == filteredExact, "FILTER clause must not rewrite")
    val badM = withFlag(33) {
      df.groupBy("g").agg(count_distinct(col("x")).as("nd"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    val exactNd = df.groupBy("g").agg(count_distinct(col("x")).as("nd"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(badM == exactNd, "unsupported m must stay exact")
  }

  test("null semantics match exact count(DISTINCT): all-null groups emit 0, mixed groups drop nulls") {
    val withNulls = Seq(
      ("a", Some("x")), ("a", Some("y")), ("a", None),
      ("b", None), ("b", None)).toDF("g", "x")
    val got = withFlag(64) {
      withNulls.groupBy("g").agg(count_distinct(col("x")).as("nd"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(got("b") == 0L, s"all-null group must emit 0, got ${got("b")}")
    // tiny-n groups read the RAW estimator's documented small-range
    // bias (~alpha*m, the no-linear-counting regime hllEstimate pins —
    // linear counting needs libm ln, the one op this repo bans): the
    // rule is for corpus-scale distinct counts, and the bias is pinned
    // here so a silent behavior change fails the build
    val rawBias = ApproxDistinctRewrite.AlphaFor(64) * 64.0
    assert(got("a") > rawBias * 0.6 && got("a") < rawBias * 1.2,
      s"tiny-n group should read the raw-regime bias ~$rawBias, got ${got("a")}")
  }
}
