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
}
