package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Batch KNN: the mapPartitions heap form must agree with the exact
  * single-query path, and the corpus must reach the final rank already
  * reduced to per-partition top-k (no full-data window exchange). */
class KnnSearchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val embeddings =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("topKBatch agrees with per-query exact topK") {
    val queries = embeddings.filter(col("vec_id").isin(0, 5, 9))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = KnnSearch.topKBatch(embeddings, "embedding", queries,
        "qid", "qv", k = 5, tieBreak = "vec_id", rankRoundDp = Some(4))
      .select(col("query_id"), col("vec_id"), col("dist"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

    val single = Seq(0L, 5L, 9L).flatMap { qid =>
      val q = embeddings.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0)
      KnnSearch.topK(embeddings, "embedding", q, 5, KnnSearch.L2,
          tieBreak = Some("vec_id"), rankRoundDp = Some(4))
        .select(col("vec_id"), col("dist"))
        .collect()
        .map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(batch == single)
  }

  test("topKBatch reduces per partition before any exchange") {
    val queries = embeddings.filter(col("vec_id").isin(0, 1))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val df = KnnSearch.topKBatch(embeddings, "embedding", queries,
      "qid", "qv", k = 3, tieBreak = "vec_id")
    val plan = df.queryExecution.executedPlan.toString
    // the corpus-side reduction is a mapPartitions stage; the only
    // exchange ranks the k·|queries|-per-partition survivors
    assert(plan.contains("MapPartitions"),
      s"expected a mapPartitions heap stage in:\n$plan")
    val mpIdx = plan.indexOf("MapPartitions")
    val exIdx = plan.indexOf("Exchange")
    assert(exIdx >= 0 && exIdx < mpIdx,
      "the only exchange must sit ABOVE the per-partition reduction " +
        "(plans print top-down)")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "no corpus×queries join may exist in the heap form")
  }

  test("topKBatch keeps ties deterministic via the tieBreak column") {
    // duplicate a vector so (dist=0) ties exist; smallest tie id must win
    val dup = embeddings.limit(1)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"),
        col("label"))
    val corpus = embeddings.select("vec_id", "embedding", "label")
      .union(dup)
    val queries = embeddings.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = KnnSearch.topKBatch(corpus, "embedding", queries,
        "qid", "qv", k = 2, tieBreak = "vec_id")
      .orderBy(col("dist"), col("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 100000L))
  }
}
