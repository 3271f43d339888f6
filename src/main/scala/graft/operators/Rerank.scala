package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.functions.VectorFunctions.{cosineSimilarity, sparseDot}

/** Rerank stage — SURVEY.md §2.5 T3 / §2.8 V6.
  *
  * The reference reranks retrieved candidates with BGE-M3 `compute_score`
  * (a cross-encoder), fusing three modes with fixed weights — dense 0.3,
  * sparse 0.2, colbert 0.5 (/root/reference/src/rag/embedding/bge.py:29-32,
  * :237-271) — then sorts descending and keeps `DEFAULT_RERANK_LIMIT = 10`
  * (src/rag/ob.py:31, rag_graph.py:404-415). When the model can't rerank it
  * falls back to the original retrieval order (doc_embedder.py:251-254).
  *
  * Spark-native: a scorer is just a Column expression over the candidate
  * rows; rerank = `withColumn(score) → orderBy(desc) → limit`. Candidates
  * number ≤ k·components (tens of rows), so this runs as a trivial
  * TakeOrderedAndProject on whatever partition holds them — cost is
  * independent of corpus size, exactly like the reference's in-memory
  * rerank of the top-k page.
  */
object Rerank {

  /** fusion weights (bge.py:29-32) */
  val DenseWeight = 0.3
  val SparseWeight = 0.2
  val ColbertWeight = 0.5

  /** keep after rerank (ob.py:31) */
  val DefaultRerankLimit = 10

  /** A scorer maps candidate-row columns to a relevance score (higher =
    * better) for a fixed query. */
  trait Scorer {
    def score(textCol: Column): Column
  }

  /** Deterministic lexical stand-in for the BGE cross-encoder: the count
    * of distinct query tokens present in the document (case-folded). Same
    * sort-desc/truncate semantics as the reference; swap in a model-backed
    * Scorer for production. */
  case class LexicalScorer(query: String) extends Scorer {
    def score(textCol: Column): Column = {
      val qTokens = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .distinct.toSeq
      size(array_intersect(
        array_distinct(tokens(lower(textCol))),
        array(qTokens.map(lit): _*))).cast("long")
    }
  }

  /** Three-mode weighted fusion (bge.py:29-32): dense cosine + sparse
    * lexical dot + a colbert-style max-sim stand-in, each already computed
    * as a column. */
  def fuse(dense: Column, sparse: Column, colbert: Column): Column =
    dense * DenseWeight + sparse * SparseWeight + colbert * ColbertWeight

  /** T3: score candidates, sort descending (tie-broken for determinism),
    * keep top `limit`. */
  def rerank(
      candidates: DataFrame,
      textCol: String,
      scorer: Scorer,
      limit: Int = DefaultRerankLimit,
      tieBreak: String,
      scoreCol: String = "rerank_score"): DataFrame = {
    require(!candidates.columns.contains(scoreCol),
      s"candidates already have a '$scoreCol' column")
    candidates
      .withColumn(scoreCol, scorer.score(col(textCol)))
      .orderBy(col(scoreCol).desc, col(tieBreak))
      .limit(limit)
  }
}
