package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorExpressionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    VectorExpressions.ensureRegistered(spark)
  }

  private def vecsDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextFloat() * 2 - 1),
        Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    } :+ ((201L, Seq.fill(64)(0f), Seq.fill(64)(1f))) // zero vector edge
    rows.toDF("id", "a", "b")
  }

  test("native l2/dot/cos match the HOF forms bit-for-bit") {
    val df = vecsDf.select(
      l2Distance(col("a"), col("b")).as("l2_hof"),
      l2DistanceNative(col("a"), col("b")).as("l2_nat"),
      dotProduct(col("a"), col("b")).as("dot_hof"),
      dotProductNative(col("a"), col("b")).as("dot_nat"),
      cosineSimilarity(col("a"), col("b")).as("cos_hof"),
      cosineSimilarityNative(col("a"), col("b")).as("cos_nat"))
    val bad = df.filter(
      col("l2_hof") =!= col("l2_nat") ||
      col("dot_hof") =!= col("dot_nat") ||
      col("cos_hof") =!= col("cos_nat")).count()
    assert(bad == 0)
  }

  test("null array, null element, and length mismatch yield null") {
    VectorExpressions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT
         graft_l2sq(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS n1,
         graft_l2sq(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)) AS n2,
         graft_dot(array(1.0F), array(1.0F, 2.0F)) AS n3,
         graft_cos(array(0.0F, 0.0F), array(1.0F, 2.0F)) AS z""").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 0.0)
  }

  test("native expression runs inside WholeStageCodegen") {
    // spark.range keeps a real physical scan (a local Seq would fold into
    // a LocalTableScan and bypass codegen entirely); build the arrays with
    // plain array() — a HOF transform lambda would itself be a
    // CodegenFallback and push the whole Project out of codegen
    val gen = spark.range(1000).select(
      array((1 to 64).map(i =>
        pmod(col("id") * i, lit(97)).cast("float")): _*).as("a"),
      array((1 to 64).map(i =>
        pmod(col("id") + i, lit(89)).cast("float")): _*).as("b"))
    val df = gen.select(l2SquaredNative(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_l2sq")), plan)
    // and interpreted eval agrees with codegen output
    val viaCodegen = df.agg(sum("d")).head().getDouble(0)
    val expr = L2SquaredDistance(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1f, 2f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4f, 6f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(expr.eval(null) == 25.0)
    assert(viaCodegen > 0.0)
  }

  test("graft_jl_l2sq matches the transform/element_at spelling bit-for-bit, runs inside codegen, nulls propagate") {
    // r21: q168's reduced-space ranking moved from a CodegenFallback
    // HOF + 16×64-term element_at tree to this fused loop — same long
    // arithmetic, same order, so the values must be IDENTICAL
    val dim = 64; val bits = 16
    val planes = graft.operators.NearDup.hyperplanesInt(bits, dim)
    val rnd = new scala.util.Random(13)
    val qp = (0 until bits).map(b => rnd.between(-500000L, 500000L))
    val params: Seq[Long] = planes ++ qp
    // real physical scan (spark.range) so codegen actually runs
    val gen = spark.range(500).select(col("id"),
      array((1 to dim).map(i =>
        (pmod(col("id") * i, lit(997)).cast("double") / 100.0 - 4.5)
          .cast("float")): _*).as("v"))
    val qcol = transform(col("v"),
      x => floor(x.cast("double") * lit(1024) + lit(0.5)).cast("long"))
    val pcols = (0 until bits).map(b =>
      (0 until dim).map(i =>
        element_at(col("__q"), i + 1) * lit(planes(b * dim + i)))
        .reduce(_ + _).as(s"__p$b"))
    val hof = gen.select(col("id"), qcol.as("__q"))
      .select(col("id") +: pcols: _*)
      .select(col("id"),
        (0 until bits).map { b =>
          val diff = col(s"__p$b") - lit(qp(b)); diff * diff
        }.reduce(_ + _).as("d2"))
    val nat = gen.select(col("id"),
      call_function("graft_jl_l2sq", col("v"), typedLit(params))
        .as("d2"))
    assert(hof.except(nat).isEmpty && nat.except(hof).isEmpty,
      "fused JL distance must equal the HOF spelling bit-for-bit")
    // inside WholeStageCodegen (the point of the rewrite)
    val plan = nat.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_jl_l2sq")), plan)
    // null/edge semantics: null vector, null element, bad params length
    val r = spark.sql(
      """SELECT
         graft_jl_l2sq(CAST(NULL AS ARRAY<FLOAT>), array(1L, 2L)) AS n1,
         graft_jl_l2sq(array(1.0F, CAST(NULL AS FLOAT)),
                       array(1L, 2L, 3L, 4L, 5L, 6L)) AS n2,
         graft_jl_l2sq(array(1.0F), array(1L, 2L, 3L)) AS n3,
         graft_jl_l2sq(array(1.0F), array(2L, 3L)) AS ok""").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // q = floor(1.0*1024 + 0.5) = 1024; proj = 1024*2 = 2048;
    // d2 = (2048 - 3)^2
    assert(r.getLong(3) == 2045L * 2045L)
    // interpreted eval agrees with codegen
    val expr = JlProjectDistExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(expr.eval(null) == 2045L * 2045L)
  }

  test("GraftExtensions injects the same builders") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }

  // ---- graft_hyperplane_bucket --------------------------------------

  /** Reference bucket composed from built-in HOFs: per plane, an
    * element-order Double fold of the dot product, then the sign bit.
    * Same op order as the native fused loop → bit-identical signs. */
  private def hofBucket(vec: org.apache.spark.sql.Column,
      planes: Seq[Double], dim: Int): org.apache.spark.sql.Column = {
    val bits = planes.length / dim
    concat((0 until bits).map { b =>
      val plane = typedLit(planes.slice(b * dim, (b + 1) * dim))
      val dot = aggregate(
        zip_with(vec, plane, (x, p) => x.cast("double") * p),
        lit(0.0), (s, x) => s + x)
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }: _*)
  }

  test("hyperplane bucket matches the HOF form bit-for-bit") {
    import graft.operators.NearDup
    val planes = NearDup.hyperplanes(bits = 8, dim = 64)
    val df = vecsDf.select(
      hyperplaneBucketNative(col("a"), planes).as("nat"),
      hofBucket(col("a"), planes, 64).as("hof"))
    assert(df.filter(col("nat") =!= col("hof")).count() == 0)
    // sane shape: 8 chars of 0/1
    val one = df.head().getString(0)
    assert(one.length == 8 && one.forall("01".contains(_)))
  }

  test("hyperplane bucket runs inside WholeStageCodegen and agrees with interpreted eval") {
    import graft.operators.NearDup
    val planes = NearDup.hyperplanes(bits = 4, dim = 8)
    val gen = spark.range(500).select(col("id"),
      array((1 to 8).map(i =>
        (pmod(col("id") * i, lit(97)) - lit(48)).cast("float")): _*).as("v"))
    val df = gen.select(col("id"),
      hyperplaneBucketNative(col("v"), planes).as("bkt"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_hyperplane_bucket")), plan)
    // interpreted eval (expression.eval) must agree with the codegen path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val viaCodegen = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 500L by 37L).foreach { id =>
      val v = (1 to 8).map(i => (((id * i) % 97) - 48).toFloat)
      val expr = HyperplaneBucketExpr(
        Literal.create(v, ArrayType(FloatType)),
        Literal.create(planes, ArrayType(DoubleType)))
      assert(expr.eval(null).toString == viaCodegen(id),
        s"interpreted != codegen for id=$id")
    }
  }

  test("hyperplane bucket null/edge semantics") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    def e(v: Any, p: Any) = HyperplaneBucketExpr(
      Literal.create(v, ArrayType(FloatType)),
      Literal.create(p, ArrayType(DoubleType))).eval(null)
    assert(e(null, Seq(1.0)) == null)                    // null vector
    assert(e(Seq(1f), null) == null)                     // null planes
    assert(e(Seq.empty[Float], Seq(1.0)) == null)        // empty vector
    assert(e(Seq(1f, 2f), Seq.empty[Double]) == null)    // empty planes
    assert(e(Seq(1f, 2f), Seq(1.0, 2.0, 3.0)) == null)   // non-dividing
    assert(e(Seq(1f, null), Seq(1.0, 1.0)) == null)      // null element
    assert(e(Seq(1f, -3f), Seq(1.0, 1.0, 1.0, 0.1)).toString == "01")
    intercept[IllegalArgumentException] {
      hyperplaneBucketNative(col("a"), Seq.empty) // wrapper refuses
    }
  }

  test("hyperplane buckets stay balanced on shifted-mean (anisotropic) vectors") {
    // positive-mean embeddings: every component in (0, 2) — the old
    // raw-first-8-dim sign bucket collapses ALL of these into "11111111";
    // random hyperplanes must keep the bucket histogram spread out so the
    // within-bucket self-join cannot go quadratic.
    import spark.implicits._
    import graft.operators.NearDup
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2f)) // strictly positive
    }
    val df = rows.toDF("id", "v")
    val planes = NearDup.hyperplanes(bits = 8, dim = 64)
    val hist = df
      .select(hyperplaneBucketNative(col("v"), planes).as("b"))
      .groupBy("b").count().as[(String, Long)].collect()
    val nBuckets = hist.length
    val maxShare = hist.map(_._2).max.toDouble / 400.0
    assert(nBuckets >= 16, s"bucket collapse: only $nBuckets buckets")
    assert(maxShare <= 0.25, s"hot bucket holds ${maxShare * 100}% of rows")
    // and the raw-sign scheme indeed collapses on this corpus (the bug
    // this expression exists to fix)
    val rawCollapsed = df.select(array_join(
      transform(slice(col("v"), 1, 8),
        x => when(x >= 0, lit("1")).otherwise(lit("0"))), "").as("b"))
      .groupBy("b").count().count()
    assert(rawCollapsed == 1L)
  }

  test("sq8 encode/distance: exact on grid points, bounded error off-grid, null edges") {
    import spark.implicits._
    // grid min=0 scale=1 per dim: values ON grid points decode exactly,
    // so the fused code-vs-self distance must be 0.0 exactly
    val onGrid = Seq(Tuple1(Seq(0f, 1f, 255f))).toDF("v")
    val params3 = typedLit(Seq(0.0, 0.0, 0.0, 1.0, 1.0, 1.0))
    val zero = onGrid.select(
      call_function("graft_sq8_l2sq",
        call_function("graft_sq8_encode", col("v"), params3),
        col("v"), params3).as("d")).head().getDouble(0)
    assert(zero == 0.0)
    // off-grid values quantize within half a step per dim: the
    // code-space distance to self is bounded by n·(scale/2)²
    val off = vecsDf.select(col("a").as("v"))
    val params = {
      val (mins, scales) =
        graft.operators.IvfIndex.sq8ParamsOf(off, "v")
      typedLit(mins ++ scales)
    }
    val maxSelf = off.select(
      call_function("graft_sq8_l2sq",
        call_function("graft_sq8_encode", col("v"), params),
        col("v"), params).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    // 64 dims × (scale/2)² with scale ≈ 2/255 → ≈ 64 × 1.6e-5
    assert(maxSelf <= 64 * math.pow(2.0 / 255 / 2, 2) * 1.01,
      s"self distance too large: $maxSelf")
    // codegen (DataFrame path) agrees with interpreted eval on literals
    // (same guard as the other native exprs)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val (mins, scales) = graft.operators.IvfIndex.sq8ParamsOf(off, "v")
    val sample = vecsDf.limit(20)
      .select(col("a"),
        call_function("graft_sq8_encode", col("a"), params).as("c"),
        call_function("graft_sq8_l2sq",
          call_function("graft_sq8_encode", col("a"), params),
          col("a"), params).as("d"))
      .collect()
    sample.foreach { r =>
      val v = r.getSeq[Float](0)
      val interp = Sq8L2SquaredExpr(
        Literal.create(r.getAs[Array[Byte]](1),
          org.apache.spark.sql.types.BinaryType),
        Literal.create(v, ArrayType(FloatType)),
        Literal.create(mins ++ scales, ArrayType(DoubleType)))
        .eval(null).asInstanceOf[Double]
      assert(interp == r.getDouble(2), "interpreted != codegen")
    }
    // length-mismatched params → null, not garbage
    val bad = onGrid.select(call_function("graft_sq8_encode", col("v"),
      typedLit(Seq(0.0))).as("c")).head()
    assert(bad.isNullAt(0))
  }
}
