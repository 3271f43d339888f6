package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

/** graft_char_jac must be value-identical to the composed HOF form it
  * replaces — same normalization, same distinct-shingle sets, same
  * empty/null handling. */
class TextExpressionsSpec extends SparkSpec {

  private val q = "spark query join table window agg"

  test("matches the HOF jaccard(charShingles) on the documents corpus") {
    VectorExpressions.ensureRegistered(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      charJaccardNative(col("text"), q, 4).as("native"),
      jaccard(charShingles(col("text"), 4), charShingles(lit(q), 4))
        .as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("edge cases: null, empty, shorter-than-n, whitespace runs") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val rows = Seq(
      null.asInstanceOf[String], "", "ab", "   ",
      "spark   query\t\njoin", "SPARK QUERY", q)
      .toDF("text")
    val both = rows.select(col("text"),
      charJaccardNative(col("text"), q, 4).as("native"),
      jaccard(charShingles(col("text"), 4), charShingles(lit(q), 4))
        .as("hof")).collect()
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"text=${r.get(0)}: native=${r.get(1)} hof=${r.get(2)}")
    }
    // identical text scores jaccard 1.0
    val self = rows.filter(col("text") === q)
      .select(charJaccardNative(col("text"), q, 4)).head().getDouble(0)
    assert(self == 1.0)
  }

  test("non-constant query is rejected at analysis") {
    VectorExpressions.ensureRegistered(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val err = intercept[Exception] {
      docs.select(call_function("graft_char_jac", col("text"), col("text"),
        lit(4))).head()
    }
    assert(err.getMessage.contains("constant"))
  }
}
