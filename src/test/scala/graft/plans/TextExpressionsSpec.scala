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

  test("graft_simhash matches the HOF simHash on the documents corpus") {
    VectorExpressions.ensureRegistered(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("text").isNotNull)
    val mismatches = docs.select(
        simHashNative(col("text")).as("native"),
        simHash(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    // edge cases incl. whitespace runs, case folding, duplicate tokens
    import spark.implicits._
    val edge = Seq("", "  ", "a", "A a  a\tb", "x Y z y x").toDF("text")
    edge.select(col("text"), simHashNative(col("text")).as("n"),
        simHash(col("text")).as("h")).collect()
      .foreach(r => assert(r.getString(1) == r.getString(2),
        s"text='${r.getString(0)}'"))
  }

  test("graft_rollhash matches the HOF rollingHash on the documents corpus") {
    VectorExpressions.ensureRegistered(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("text").isNotNull)
    val mismatches = docs.select(
        rollingHashNative(col("text")).as("native"),
        rollingHash(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    import spark.implicits._
    val edge = Seq("", " x ", "A  B\n\tc", "1234").toDF("text")
    edge.select(col("text"), rollingHashNative(col("text")).as("n"),
        rollingHash(col("text")).as("h")).collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"text='${r.getString(0)}'"))
  }

  test("graft_tok_stats-derived metrics match the HOF quality surface") {
    VectorExpressions.ensureRegistered(spark)
    val sw = Seq("the", "a", "of", "and", "value", "table")
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("text").isNotNull)
    val st = tokenStatsNative(col("text"), sw)
    val mismatches = docs.select(col("text"), st.as("st"))
      .select(
        qualityFromStats(col("text"), col("st")).as("nq"),
        qualityScore(col("text"), sw).as("hq"),
        stopwordRatioFromStats(col("st")).as("ns"),
        stopwordRatio(col("text"), sw).as("hs"),
        avgTokenLengthFromStats(col("st")).as("na"),
        avgTokenLength(col("text")).as("ha"))
      .filter(col("nq") =!= col("hq") || col("ns") =!= col("hs") ||
        col("na") =!= col("ha"))
      .count()
    assert(mismatches == 0)
    // empty text: both forms give 0-ratios
    import spark.implicits._
    val empty = Seq("", "   ").toDF("text")
      .select(tokenStatsNative(col("text"), sw).as("st"))
      .select(stopwordRatioFromStats(col("st")).as("s"),
        avgTokenLengthFromStats(col("st")).as("a")).collect()
    empty.foreach { r =>
      assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
    }
  }

  test("graft_word_shingles matches the HOF wordShingles") {
    VectorExpressions.ensureRegistered(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val mismatches = docs.select(
        wordShinglesNative(col("text"), 3).as("native"),
        wordShingles(col("text"), 3).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    import spark.implicits._
    val edge = Seq(null.asInstanceOf[String], "", "a b", "a b c",
      "A  b\tC d a b c").toDF("text")
    edge.select(col("text"),
        wordShinglesNative(col("text"), 3).as("n"),
        wordShingles(col("text"), 3).as("h")).collect()
      .foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"text='${r.get(0)}'")
      }
  }

  test("graft_minhash matches the HOF minhashSignature") {
    VectorExpressions.ensureRegistered(spark)
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("text").isNotNull)
    val sh = docs.select(wordShinglesNative(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val mismatches = sh.select(
        minhashNative(col("shingles"), 12).as("native"),
        graft.operators.NearDup.minhashSignature(col("shingles"), 12)
          .as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    // empty shingle set → null signature
    import spark.implicits._
    val empty = Seq(Seq.empty[String]).toDF("shingles")
      .select(minhashNative(col("shingles"), 4)).collect()
    assert(empty.head.isNullAt(0))
  }

  test("graft_query_overlap matches the HOF tf/sparseDot + intersect form") {
    VectorExpressions.ensureRegistered(spark)
    import graft.functions.VectorFunctions.sparseDot
    val qWeights = Seq("spark" -> 2.0, "query" -> 1.5, "join" -> 1.0,
      "table" -> 1.0, "window" -> 0.5, "agg" -> 0.5)
    val qMap = map(qWeights.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    val qKeys = array(qWeights.map(kv => lit(kv._1)): _*)
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("text").isNotNull)
    val ts = tokens(lower(col("text")))
    val tf = map_from_arrays(qKeys,
      transform(qKeys, k => size(filter(ts, x => x === k)).cast("double")))
    val mismatches = docs.select(
        queryOverlapNative(col("text"), qWeights).as("ov"),
        sparseDot(tf, qMap).as("hs"),
        size(array_intersect(array_distinct(ts), qKeys)).cast("long")
          .as("hh"))
      .filter(col("ov.sparse") =!= col("hs") ||
        col("ov.n_hit") =!= col("hh"))
      .count()
    assert(mismatches == 0)
    import spark.implicits._
    val empty = Seq("", "none of these").toDF("text")
      .select(queryOverlapNative(col("text"), qWeights).as("ov"))
      .select(col("ov.sparse"), col("ov.n_hit")).collect()
    empty.foreach { r =>
      assert(r.getDouble(0) == 0.0 && r.getLong(1) == 0L)
    }
  }

  test("langIdHeuristicNative matches the HOF langIdHeuristic") {
    VectorExpressions.ensureRegistered(spark)
    val profiles = Seq(
      "en" -> Seq("the", "a", "fast", "slow"),
      "es" -> Seq("data", "row", "part"),
      "zh" -> Seq("spark", "window", "stream"))
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("text").isNotNull)
    val mismatches = docs.select(
        langIdHeuristicNative(col("text"), profiles).as("native"),
        langIdHeuristic(col("text"), profiles).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    // tie behavior: zero-score text picks the lexicographically largest
    import spark.implicits._
    val tie = Seq("nothing matches here").toDF("text")
      .select(langIdHeuristicNative(col("text"), profiles)).head()
    assert(tie.getString(0) == "zh")
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
