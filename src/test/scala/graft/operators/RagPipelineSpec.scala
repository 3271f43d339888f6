package graft.operators

import graft.SparkSpec
import graft.functions.HashEmbedder
import graft.sources.{CorpusStore, MarkdownIngest}

class RagPipelineSpec extends SparkSpec {

  private val corpusDir = getClass.getResource("/corpus").getPath
  private lazy val embedder = HashEmbedder(dim = 16)

  private lazy val corpus = {
    val chunks = MarkdownIngest.ingest(spark, corpusDir, Seq("oracle"))
    CorpusStore.fromChunks(chunks, "observer", embedder)
      .union(CorpusStore.fromChunks(chunks, "ocp", embedder))
      .cache()
  }

  test("end-to-end answer: validated components, context, numbered refs") {
    val ans = RagPipeline.answer(spark, corpus, embedder,
      queryText = "vector search index",
      requestedComponents = Seq("ocp", "bogus", "ocp"),
      urlRules = Seq(("^file:", "https://docs.example.com/")))
    // F5: ocp kept, bogus dropped, observer (default) appended -> 2 comps;
    // rerank=true -> k=10 per component, capped by the 8 chunks per comp
    assert(ans.nCandidates == 16)
    assert(ans.context.nonEmpty)
    assert(ans.context.contains("\n=====\n"))
    // A5: refs numbered 1..n, urls rewritten, unique
    val ids = ans.references.map(_._1)
    assert(ids == (1 to ids.size))
    assert(ans.references.forall(_._2.startsWith("https://docs.example.com/")))
    assert(ans.references.map(_._2).distinct.size == ans.references.size)
  }

  test("no-rerank path uses adaptive k") {
    val ans = RagPipeline.answer(spark, corpus, embedder,
      queryText = "query", requestedComponents = Seq("observer"),
      rerank = false)
    // 1 component, no rerank: k = max(3, 13-3) = 10, capped by 8 chunks
    assert(ans.nCandidates == 8)
  }

  test("unknown components fall back to the default component only") {
    val ans = RagPipeline.answer(spark, corpus, embedder,
      queryText = "anything", requestedComponents = Seq("nope", "zilch"))
    assert(ans.nCandidates == 8) // observer only
  }

  test("retrieveThinIvf: each leg prunes BOTH directory levels, hydration stays broadcast, full probe equals the exact path") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val docsT = docs.select(col("doc_id"), col("text").as("document"),
      struct(lit("file:x").as("doc_url")).as("metadata"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-rag-ivf-").toString
    IvfIndex.build(emb, "vec_id", "embedding", nlist = 8,
      componentCol = Some("label")).write(s"$tmp/ivf")
    val idx = IvfIndex.load(spark, s"$tmp/ivf", "vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)

    val pruned = RagPipeline.retrieveThinIvf(idx, docsT, "doc_id", q,
      "spark table", Seq(1, 3), nprobe = 2)
    val plan = pruned.queryExecution.executedPlan.toString
    // every index-scan leg must carry PartitionFilters on BOTH the
    // component and the cluster directory level — the flagship
    // partition_names+ANN query as one doubly-pruned scan per component
    val legs = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(plan)
      .toSeq.filter(_.contains(IvfIndex.ClusterCol))
    assert(legs.nonEmpty, s"no pruned index scan in plan:\n$plan")
    assert(legs.forall(_.contains("label")),
      s"index legs missing the component prune: $legs")
    // the ≤ k·components candidate side reaches the docs scan broadcast
    assert(plan.contains("BroadcastExchange"), s"no broadcast in:\n$plan")

    // nprobe ≥ nlist makes each leg exact, so the IVF path must return
    // exactly what the exact pruned path returns — same ranks, same docs
    val full = RagPipeline.retrieveThinIvf(idx, docsT, "doc_id", q,
        "spark table", Seq(1, 3), nprobe = idx.nlist)
      .select(col("final_rank"), col("vec_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val vectors = emb.select(col("vec_id").as("id"), col("embedding"),
      col("label").as("component_code"))
    val exact = RagPipeline.retrieveThin(vectors, docsT, "doc_id", q,
        "spark table", Seq(1, 3), rerank = true)
      .select(col("final_rank"), col("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(full == exact)
  }

  test("retrieveThin broadcasts the candidate set into the docs join") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val vectors = emb.select(col("vec_id").as("id"), col("embedding"),
      col("label").as("component_code"))
    val docsT = docs.select(col("doc_id"), col("text").as("document"),
      struct(lit("file:x").as("doc_url")).as("metadata"))
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val df = RagPipeline.retrieveThin(vectors, docsT, "doc_id", q,
      "spark table", Seq(1, 3), rerank = true)
    val plan = df.queryExecution.executedPlan.toString
    // the ≤ k·components candidate side must reach the docs scan as a
    // broadcast — never a shuffle of the documents table against it
    assert(plan.contains("BroadcastExchange"), s"no broadcast in:\n$plan")
    val rows = df.select("final_rank", "id", "ref_id").collect()
    assert(rows.nonEmpty && rows.length <= 10)
  }
}
