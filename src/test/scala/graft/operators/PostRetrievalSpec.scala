package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PostRetrievalSpec extends SparkSpec {
  import Rerank._

  test("lexical rerank sorts desc with deterministic ties and truncates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join table"), (2L, "nothing relevant here"),
      (3L, "spark spark spark"), (4L, "join table window agg query spark"))
      .toDF("doc_id", "text")
    val out = Rerank.rerank(docs, "text",
      LexicalScorer("spark query join table window agg"),
      limit = 3, tieBreak = "doc_id")
      .select("doc_id", "rerank_score").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((4L, 6L), (1L, 3L), (3L, 1L)))
  }

  test("fusion weights are dense 0.3 / sparse 0.2 / colbert 0.5") {
    import spark.implicits._
    val v = Seq((1.0, 1.0, 1.0)).toDF("d", "s", "c")
      .select(Rerank.fuse(col("d"), col("s"), col("c"))).head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    val only = Seq((1.0, 0.0, 0.0)).toDF("d", "s", "c")
      .select(Rerank.fuse(col("d"), col("s"), col("c"))).head.getDouble(0)
    assert(math.abs(only - 0.3) < 1e-12)
  }

  test("contextConcat restores rank order regardless of row order") {
    import spark.implicits._
    val docs = Seq((3, "c"), (1, "a"), (2, "b")).toDF("rn", "text")
    val ctx = docs.agg(PostRetrieval.contextConcat(col("rn"), col("text")))
      .head.getString(0)
    assert(ctx == "a\n=====\nb\n=====\nc")
  }

  test("refNumbering assigns stable first-seen 1-based ids") {
    import spark.implicits._
    val docs = Seq((10L, "u2"), (5L, "u1"), (20L, "u1"), (15L, "u3"))
      .toDF("rank", "url")
    val refs = PostRetrieval.refNumbering(docs, "url", "rank")
      .as[(Int, String, Long)].collect().toSeq
    assert(refs == Seq((1, "u1", 5L), (2, "u2", 10L), (3, "u3", 15L)))
  }

  test("rewriteCitations rewrites known indices, keeps unknown, no [@1]/[@10] clash") {
    import spark.implicits._
    val urlMap = map(lit(1), lit("https://u/1"), lit(10), lit("https://u/10"))
    val out = Seq("a [@1] b [@10] c [@7] d")
      .toDF("t")
      .select(PostRetrieval.rewriteCitations(col("t"), urlMap))
      .head.getString(0)
    assert(out == "a [[1]](https://u/1) b [[10]](https://u/10) c [@7] d")
  }

  test("citationJoin explodes markers and joins the numbered refs") {
    import spark.implicits._
    val answers = Seq((1L, "see [@2] and [@2] and [@9]"), (2L, "none"))
      .toDF("doc_id", "answer")
    val refs = Seq((1, "u1"), (2, "u2")).toDF("ref_id", "url")
    val out = PostRetrieval.citationJoin(answers, "answer", refs, "ref_id")
      .select("doc_id", "cited_ref", "url").as[(Long, Int, String)]
      .collect().toSeq
    assert(out == Seq((1L, 2, "u2"))) // distinct markers, unknown 9 dropped
  }

  test("rewriteUrls applies rules in order (chain, not set)") {
    import spark.implicits._
    val rules = Seq(("^a", "b"), ("^b", "c"))
    val out = Seq("a-x").toDF("u")
      .select(PostRetrieval.rewriteUrls(col("u"), rules)).head.getString(0)
    assert(out == "c-x") // second rule sees the first rule's output
  }
}
