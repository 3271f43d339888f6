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

  test("GraftExtensions injects the same builders") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
