package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Exact k-nearest-neighbor retrieval — the Spark-native re-expression of
  * the reference's ANN top-k (`similarity_search_by_vector`,
  * /root/reference/src/rag/doc_embedder.py:196-220; HNSW DDL
  * src/tools/load.py:26).
  *
  * Exact top-k by `orderBy(dist).limit(k)` compiles to
  * `TakeOrderedAndProject`: each task keeps a k-element heap, only k rows
  * per partition cross to the driver — no global sort, no shuffle of the
  * table. At 100 TB this is a single scan-bound pass; combine with a
  * partition-column filter (the reference's `partition_names` pruning) so
  * parquet partition pruning cuts the scan first.
  *
  * Approximate variants for scale live in [[IvfIndex]].
  */
object KnnSearch {

  sealed trait Metric {
    /** distance column (smaller = closer) */
    def dist(v: Column, q: Seq[Float]): Column
  }
  case object L2 extends Metric {
    def dist(v: Column, q: Seq[Float]): Column = l2Distance(v, litVec(q))
  }
  case object Cosine extends Metric {
    def dist(v: Column, q: Seq[Float]): Column = cosineDistance(v, litVec(q))
  }
  case object InnerProduct extends Metric {
    // larger dot = closer, so negate for a distance
    def dist(v: Column, q: Seq[Float]): Column = -dotProduct(v, litVec(q))
  }

  // Native codegen'd variants (graft.plans.VectorExpressions): identical
  // values, one fused loop per row instead of zip_with allocation — and
  // the projection stays inside WholeStageCodegen (a HOF lambda is a
  // CodegenFallback that ejects it). ~1.6× (l2) to 3.5× (cosine) faster
  // on a full-corpus scan (graft.tools.DistanceBench, sf0.1). The session
  // must have run VectorExpressions.ensureRegistered (or carry
  // GraftExtensions).
  case object NativeL2 extends Metric {
    def dist(v: Column, q: Seq[Float]): Column =
      l2DistanceNative(v, litVec(q))
  }
  case object NativeCosine extends Metric {
    def dist(v: Column, q: Seq[Float]): Column =
      lit(1.0) - cosineSimilarityNative(v, litVec(q))
  }
  case object NativeInnerProduct extends Metric {
    def dist(v: Column, q: Seq[Float]): Column =
      -dotProductNative(v, litVec(q))
  }

  def litVec(q: Seq[Float]): Column = array(q.map(x => lit(x)): _*)

  /** Exact top-k: returns the input rows plus a distance column (named
    * `distCol`, default "dist"), k nearest first. Deterministic under ties
    * via `tieBreak`. Throws if `distCol` already exists in the input —
    * silently overwriting a user column would corrupt downstream plans. */
  def topK(
      corpus: DataFrame,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      metric: Metric = L2,
      tieBreak: Option[String] = None,
      distCol: String = "dist",
      rankRoundDp: Option[Int] = None): DataFrame = {
    require(!corpus.columns.contains(distCol),
      s"corpus already has a '$distCol' column; pass a different distCol")
    val rawDist = metric.dist(col(vecCol), query)
    // Optional cross-engine determinism mode (SURVEY §7.5): round the
    // distance BEFORE ranking so two engines that disagree below the
    // rounding precision still produce the identical (dist, tieBreak) order.
    val distExpr = rankRoundDp.fold(rawDist)(dp => round(rawDist, dp))
    val withDist = corpus.withColumn(distCol, distExpr)
    val ordered = tieBreak match {
      case Some(c) => withDist.orderBy(col(distCol), col(c))
      case None    => withDist.orderBy(col(distCol))
    }
    ordered.limit(k)
  }

  /** Batch top-k: many query vectors against the corpus in ONE scan —
    * broadcast the (small) query set, nested-loop join corpus×queries,
    * then a per-query window top-k. The corpus-side cost is a single
    * pass however many queries ride along; the shuffle is keyed on
    * query_id for the rank, moving only corpus_rows × |queries| scored
    * pairs (prune first for less). This is J1's "batch of queries"
    * form (SURVEY §2.3). */
  def topKBatch(
      corpus: DataFrame,
      vecCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      tieBreak: String,
      distCol: String = "dist",
      rankRoundDp: Option[Int] = None,
      native: Boolean = false): DataFrame = {
    require(!corpus.columns.contains(distCol),
      s"corpus already has a '$distCol' column; pass a different distCol")
    val q = broadcast(queries.select(
      col(queryIdCol).as("__qid"), col(queryVecCol).as("__qvec")))
    val dist =
      if (native) l2DistanceNative(col(vecCol), col("__qvec"))
      else l2Distance(col(vecCol), col("__qvec"))
    val scored = corpus.crossJoin(q)
      .withColumn(distCol,
        rankRoundDp.fold(dist)(dp => round(dist, dp)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid"))
      .orderBy(col(distCol), col(tieBreak))
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn", "__qvec")
      .withColumnRenamed("__qid", "query_id")
  }

  /** The reference's adaptive per-component k:
    * `10` when reranking else `max(3, 13 - 3 * nComponents)`
    * (rag_graph.py:367-375). */
  def adaptiveK(nComponents: Int, rerank: Boolean): Int =
    if (rerank) 10 else math.max(3, 13 - 3 * nComponents)

  /** Per-component partition-pruned search + bag union (SURVEY §2.4 A4):
    * one filtered top-k per component code, then a bag union (`union`).
    * Each leg prunes to its parquet partition; the union is a cheap
    * plan-level concat. */
  def searchComponents(
      corpus: DataFrame,
      vecCol: String,
      partitionCol: String,
      query: Seq[Float],
      componentCodes: Seq[Int],
      rerank: Boolean,
      metric: Metric = L2,
      tieBreak: Option[String] = None,
      distCol: String = "dist",
      rankRoundDp: Option[Int] = None): DataFrame = {
    // same contract on both branches: never silently overwrite a user column
    require(!corpus.columns.contains(distCol),
      s"corpus already has a '$distCol' column; pass a different distCol")
    if (componentCodes.isEmpty) {
      // the reference path can legitimately route to zero components
      // (rag_graph.py:343-354 after validation) — return an empty result
      // with the output schema rather than throwing on reduce.
      corpus.withColumn(distCol, lit(0.0)).filter(lit(false))
    } else {
      val k = adaptiveK(componentCodes.size, rerank)
      componentCodes
        .map(code => topK(
          corpus.filter(col(partitionCol) === code),
          vecCol, query, k, metric, tieBreak, distCol, rankRoundDp))
        .reduce(_ union _)
    }
  }
}
