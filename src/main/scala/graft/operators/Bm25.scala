package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical relevance scoring — the classical keyword-retrieval
  * counterpart of the engine's dense/sparse hybrid surface (the
  * reference fuses a lexical weight into its ranking,
  * /root/reference/src/embedding/bge.py:178-222; this operator gives
  * the standalone corpus-statistics form a training-data pipeline uses
  * for retrieval baselines and relevance filtering).
  *
  * Two passes, both scan-shaped and deterministic:
  *
  *   1. STATS: one aggregation over the tokenized corpus collects N
  *      (doc count), Σ|doc| (total token count) and per-term document
  *      frequencies — ≤ 2 + |terms| INTEGER scalars to the driver, so
  *      the corpus-level constants (avgdl, idf_t) are exact and
  *      order-independent (no cross-row float summation anywhere);
  *   2. SCORE: a narrow per-row pass computes each term's tf with a
  *      fused `filter(tokens, = t) → size` (array HOFs — no explode, no
  *      (doc × term) row blow-up, no shuffle), folds the |terms|
  *      contributions in FIXED term order, and a
  *      `TakeOrderedAndProject` keeps the top k. At 100 TB both passes
  *      are single scans; only k rows and a handful of scalars ever
  *      leave the executors.
  *
  * Scoring is the standard Robertson/Spärck-Jones form with the +1
  * idf floor (Lucene's): idf_t = ln((N − df_t + 0.5)/(df_t + 0.5) + 1),
  * contribution_t = idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·|doc|/avgdl)).
  * Every constant derives from integers, so a double-precision SQL
  * replay reproduces the scores bit-for-bit (the q63 oracle); ranking
  * rounds to `roundDp` with an id tie-break, the engine's
  * cross-engine-determinism pattern (SURVEY §7.5).
  *
  * Tokenization is the engine's standard lexical form (q38's rerank):
  * lowercase, split on whitespace, drop empties.
  */
object Bm25 {

  // the engine's ONE lexical tokenizer (whitespace split, empties
  // dropped) — composed, not copied, so BM25 can never drift from the
  // rerank/shingle surface that shares it
  private def tokens(textCol: Column): Column =
    graft.functions.TextFunctions.tokens(lower(textCol))

  /** Corpus-level BM25 constants: doc count, total token count, and
    * per-term document frequency — all integers, all order-independent.
    * At scale these are the REUSABLE artifact: corpus statistics drift
    * slowly, so a query service computes them once per corpus version
    * ([[stats]], one aggregation scan) and serves every query from one
    * scoring scan — re-deriving them per query would double every
    * query's corpus scans for values that didn't change. */
  final case class CorpusStats(n: Long, totalLen: Long,
      df: Map[String, Long]) {
    require(n >= 0 && totalLen >= 0, s"negative stats: $this")
    // df > n can only come from stats of a DIFFERENT corpus — it would
    // push the idf argument ≤ 0 and score NaN, which sorts silently
    // instead of failing; reject at construction
    require(df.values.forall(d => d >= 0 && d <= n),
      s"document frequency exceeds corpus size — stats from another " +
        s"corpus? $this")
  }

  private def perDocFrame(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(
        col(idCol) +: size(col("__toks")).as("__dl") +:
          queryTerms.zipWithIndex.map { case (t, i) =>
            size(filter(col("__toks"), x => x === lit(t))).as(s"__tf$i")
          }: _*)

  /** ONE aggregation scan → the corpus constants for `queryTerms`
    * (more generally: for any term vocabulary you plan to query). */
  def stats(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): CorpusStats = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val perDoc = perDocFrame(docs, idCol, textCol, queryTerms)
    val row = perDoc.agg(
      count(lit(1)).as("n"),
      sum(col("__dl")).as("total") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
      .head()
    // sums over an EMPTY corpus are NULL, not 0
    CorpusStats(row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1),
      queryTerms.zipWithIndex.map { case (t, i) =>
        t -> (if (row.isNullAt(2 + i)) 0L else row.getLong(2 + i))
      }.toMap)
  }

  /** Top-`k` documents by BM25 score for `queryTerms`. Documents
    * containing NO query term are dropped (score 0 — emitting the whole
    * corpus with zeros would make the result corpus-sized). Output:
    * (idCol, score) with `score` rounded to `roundDp`, ranked
    * (score DESC, id ASC).
    *
    * `precomputed` supplies the corpus constants (from [[stats]],
    * usually computed once per corpus version) so the query costs ONE
    * scoring scan; None derives them fresh with an extra stats scan —
    * fine for ad-hoc use, wasteful per-query at scale. The two paths
    * are bit-identical for matching stats (spec-asserted). */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      roundDp: Int = 4,
      precomputed: Option[CorpusStats] = None): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms,
      s"duplicate query terms would double-count: $queryTerms")
    val perDoc = perDocFrame(docs, idCol, textCol, queryTerms)
    val cs = precomputed.getOrElse(stats(docs, idCol, textCol, queryTerms))
    precomputed.foreach(s => require(
      queryTerms.forall(s.df.contains),
      s"precomputed stats lack df for ${queryTerms.filterNot(s.df.contains)}"))
    val n = cs.n
    if (n == 0L)
      return perDoc.select(col(idCol), lit(0.0).as("score")).filter(lit(false))
    val avgdl = cs.totalLen.toDouble / n
    val idf = queryTerms.map { t =>
      val df = cs.df(t).toDouble
      math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }
    // SCORE: fixed-order fold of the per-term contributions — the same
    // left-associated chain the oracle SQL writes, so the double result
    // is bit-identical cross-engine
    val lenNorm = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("__dl").cast("double") / lit(avgdl))
    val score = queryTerms.indices
      .map { i =>
        val tf = col(s"__tf$i").cast("double")
        lit(idf(i)) * (tf * lit(k1 + 1.0)) / (tf + lenNorm)
      }
      .reduceLeft(_ + _)
    val anyHit = queryTerms.indices
      .map(i => col(s"__tf$i")).reduceLeft(_ + _) > 0
    perDoc.filter(anyHit)
      .select(col(idCol), round(score, roundDp).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
