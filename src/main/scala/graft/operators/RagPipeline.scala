package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{ChatFunctions, Embedder}
import graft.sources.CorpusStore

/** The flagship retrieval pipeline — the reference's §3.1 chat-query data
  * path (/root/reference/src/rag/rag_graph.py:365-510) minus the LLM
  * calls, composed from the engine's operators:
  *
  *   validate components (F5) → adaptive k (T2) → per-component
  *   partition-pruned exact top-k + bag union (F3/J1/T1/A4) → lexical
  *   rerank (T3/V6) → URL rewrite (X1) → first-seen reference numbering
  *   (A5) → ordered context concat (A3).
  *
  * The LangGraph control flow collapses to driver code (SURVEY §3.1);
  * every data-touching step is a DataFrame op that scales with the
  * corpus, and the candidate set after top-k is tiny, so everything
  * downstream of retrieval costs O(k·components) regardless of corpus
  * size.
  */
object RagPipeline {

  case class Answer(
      context: String,
      references: Seq[(Int, String)],
      nCandidates: Long)

  def answer(
      spark: SparkSession,
      corpus: DataFrame,
      embedder: Embedder,
      queryText: String,
      requestedComponents: Seq[String],
      componentMap: Map[String, Int] = CorpusStore.defaultComponents,
      defaultComponent: String = "observer",
      rerank: Boolean = true,
      urlRules: Seq[(String, String)] = Nil): Answer = {

    // F5: validate + dedup + force default (driver-side — the list is tiny)
    val valid = {
      val kept = requestedComponents.distinct
        .filter(componentMap.contains)
      if (kept.contains(defaultComponent)) kept
      else kept :+ defaultComponent
    }
    val codes = valid.map(componentMap)

    // V2: embed the query once
    val qVec = embedder.embedQuery(spark, queryText)

    // F3/J1/T1/T2/A4: pruned per-component top-k, bag union. Cache the
    // candidate set (k·components rows): three downstream actions (count,
    // context, refs) would otherwise re-run the corpus KNN scan three
    // times.
    val candidates = KnnSearch.searchComponents(
      corpus, "embedding", "component_code", qVec, codes,
      rerank = rerank, tieBreak = Some("id")).cache()
    try {
      val nCandidates = candidates.count() // also materializes the cache

      // T3/V6: rerank (sort desc, keep 10) — candidate set is tiny
      val reranked = Rerank.rerank(candidates, "document",
          Rerank.LexicalScorer(queryText), tieBreak = "id")
        .withColumn("rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("rerank_score").desc, col("id"))))

      // X1 + A5: rewrite urls, dedup with stable first-seen numbering
      val withUrl = reranked.withColumn("url",
        PostRetrieval.rewriteUrls(col("metadata.doc_url"), urlRules))
      val refs = PostRetrieval.refNumbering(withUrl, "url", "rank")

      // A3: ordered context concat
      val context = withUrl
        .agg(PostRetrieval.contextConcat(col("rank"), col("document")))
        .head.getString(0)

      Answer(
        context,
        refs.orderBy("ref_id").collect()
          .map(r => (r.getInt(0), r.getString(1))).toSeq,
        nCandidates)
    } finally candidates.unpersist()
  }
}
