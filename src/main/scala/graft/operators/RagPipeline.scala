package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Embedder
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
  *
  * [[retrieve]] is the lazy DataFrame form (one row per kept candidate,
  * with rank / rerank score / rewritten URL / reference number);
  * [[answer]] materializes it into the reference's answer payload
  * (context string + numbered reference list).
  */
object RagPipeline {

  case class Answer(
      context: String,
      references: Seq[(Int, String)],
      nCandidates: Long)

  /** Everything after candidate retrieval: rerank (T3), stable rank,
    * URL rewrite (X1), first-seen reference numbering (A5), numbered
    * refs joined back per candidate. All ops run on ≤ k·components
    * rows. */
  private def postProcess(
      candidates: DataFrame,
      queryText: String,
      urlRules: Seq[(String, String)],
      idCol: String,
      docCol: String,
      urlExpr: Column): DataFrame = {
    val reranked = Rerank.rerank(candidates, docCol,
        Rerank.LexicalScorer(queryText), tieBreak = idCol)
      .withColumn("final_rank",
        row_number().over(
          Window.orderBy(col("rerank_score").desc, col(idCol))))
    val withUrl = reranked.withColumn("url",
      PostRetrieval.rewriteUrls(urlExpr, urlRules))
    // null-safe equality: a candidate with a NULL url (missing
    // metadata) still gets numbered and kept — refNumbering's groupBy
    // emits a null-url group, and <=> matches it back, so the join
    // neither drops nor duplicates rows
    val refs = PostRetrieval.refNumbering(withUrl, "url", "final_rank")
      .select(col("ref_id"), col("url").as("__ref_url"))
    withUrl.join(broadcast(refs), col("url") <=> col("__ref_url"))
      .drop("__ref_url")
  }

  /** The §3.1 data path as one lazy DataFrame: pruned per-component
    * top-k against `queryVec`, lexically reranked for `queryText`, with
    * rewritten URLs and reference numbers. Callers pick their own
    * column subset; [[answer]] folds it into the chat payload. */
  def retrieve(
      corpus: DataFrame,
      queryVec: Seq[Float],
      queryText: String,
      componentCodes: Seq[Int],
      rerank: Boolean = true,
      urlRules: Seq[(String, String)] = Nil,
      idCol: String = "id",
      vecCol: String = "embedding",
      partitionCol: String = "component_code",
      docCol: String = "document",
      urlExpr: Option[Column] = None,
      metric: KnnSearch.Metric = KnnSearch.L2,
      rankRoundDp: Option[Int] = None): DataFrame = {
    val candidates = KnnSearch.searchComponents(
      corpus, vecCol, partitionCol, queryVec, componentCodes,
      rerank = rerank, metric = metric, tieBreak = Some(idCol),
      rankRoundDp = rankRoundDp)
    postProcess(candidates, queryText, urlRules, idCol, docCol,
      urlExpr.getOrElse(col("metadata.doc_url")))
  }

  /** Candidate hydration shared by the thin-table forms: the
    * ≤ k·components candidate rows reach the (corpus-scale) docs table
    * as an EXPLICIT broadcast hash — the docs table is scanned once
    * against a hash of candidate ids, never shuffled against them. */
  private def hydrate(
      candidates: DataFrame,
      docs: DataFrame,
      docKeyCol: String,
      idCol: String): DataFrame =
    broadcast(candidates)
      .join(docs, candidates(idCol) === docs(docKeyCol))

  /** The scale-correct two-table form: top-k runs on the THIN vector
    * table alone (id, vector, component — the only columns retrieval
    * needs), and document text/metadata are joined in only for the
    * ≤ k·components candidates, explicitly broadcast — the reference's
    * "fetch full docs for the hits" shape. Joining a 100 TB document
    * table into the corpus BEFORE retrieval would shuffle both tables to
    * discard all but k rows; here the docs table is scanned once against
    * a broadcast hash of the candidate ids. Use [[retrieve]] when the
    * corpus already stores text inline (CorpusStore's layout). */
  def retrieveThin(
      vectors: DataFrame,
      docs: DataFrame,
      docKeyCol: String,
      queryVec: Seq[Float],
      queryText: String,
      componentCodes: Seq[Int],
      rerank: Boolean = true,
      urlRules: Seq[(String, String)] = Nil,
      idCol: String = "id",
      vecCol: String = "embedding",
      partitionCol: String = "component_code",
      docCol: String = "document",
      urlExpr: Option[Column] = None,
      metric: KnnSearch.Metric = KnnSearch.L2,
      rankRoundDp: Option[Int] = None): DataFrame = {
    val candidates = KnnSearch.searchComponents(
      vectors, vecCol, partitionCol, queryVec, componentCodes,
      rerank = rerank, metric = metric, tieBreak = Some(idCol),
      rankRoundDp = rankRoundDp)
    postProcess(hydrate(candidates, docs, docKeyCol, idCol), queryText,
      urlRules, idCol, docCol, urlExpr.getOrElse(col("metadata.doc_url")))
  }

  /** [[retrieveThin]] through a component-scoped [[IvfIndex]] — the
    * reference's flagship retrieval made scale-shaped end-to-end:
    * `similarity_search_by_vector(..., partition_names=[comp])` runs ANN
    * inside pruned LIST partitions (rag_graph.py:365-417 via
    * doc_embedder.py:196-220), and here each per-component top-k leg is
    * ONE doubly-pruned directory scan (component partition AND probed
    * clusters are both parquet PartitionFilters — asserted in
    * RagPipelineSpec), so a routed query reads
    * ~|components|/ncomponents × nprobe/nlist of the corpus. Candidate
    * hydration and post-processing are identical to [[retrieveThin]]:
    * docs join only the ≤ k·components candidates, broadcast. The
    * trade is IVF recall (tunable via nprobe; nprobe ≥ nlist makes each
    * leg exact and the result equal to [[retrieveThin]] on the same
    * scope). Requires an index built with `componentCol` — the unscoped
    * layout cannot prune the component level and [[IvfIndex#search]]
    * refuses rather than silently scanning out of scope. */
  def retrieveThinIvf(
      index: IvfIndex,
      docs: DataFrame,
      docKeyCol: String,
      queryVec: Seq[Float],
      queryText: String,
      componentCodes: Seq[Int],
      nprobe: Int,
      rerank: Boolean = true,
      urlRules: Seq[(String, String)] = Nil,
      docCol: String = "document",
      urlExpr: Option[Column] = None,
      metric: KnnSearch.Metric = KnnSearch.L2,
      rankRoundDp: Option[Int] = None): DataFrame = {
    val idCol = index.idCol
    val candidates =
      if (componentCodes.isEmpty)
        // same zero-component contract as KnnSearch.searchComponents
        index.assigned.withColumn("dist", lit(0.0)).filter(lit(false))
      else {
        val k = KnnSearch.adaptiveK(componentCodes.size, rerank)
        // one scoped leg per component (the reference's per-partition
        // top-k semantics), bag-unioned — each leg prunes both
        // directory levels; probe planning is driver-side per leg over
        // the same tiny centroid set
        componentCodes
          .map(code => index.search(queryVec, k, nprobe, metric,
            tieBreak = Some(idCol), components = Seq(code),
            rankRoundDp = rankRoundDp))
          .reduce(_ unionByName _)
      }
    postProcess(hydrate(candidates, docs, docKeyCol, idCol), queryText,
      urlRules, idCol, docCol, urlExpr.getOrElse(col("metadata.doc_url")))
  }

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

      val processed = postProcess(candidates, queryText, urlRules,
        "id", "document", col("metadata.doc_url"))

      // A3: ordered context concat (refs join neither drops nor
      // duplicates rows — one ref per distinct url, every url present)
      val context = processed
        .agg(PostRetrieval.contextConcat(col("final_rank"), col("document")))
        .head.getString(0)

      Answer(
        context,
        processed.select(col("ref_id"), col("url")).distinct()
          .orderBy("ref_id").collect()
          .map(r => (r.getInt(0), r.getString(1))).toSeq,
        nCandidates)
    } finally candidates.unpersist()
  }
}
