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

  /** Maximal marginal relevance (Carbonell & Goldstein 1998) — the
    * diversity-aware rerank between plain top-k and the cross-encoder:
    * greedily pick the candidate maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`, so near-duplicate
    * hits stop crowding out coverage (the RAG context window is the
    * north-star consumer: k slots should not hold one paragraph five
    * times).
    *
    * ENGINE-EXACT arithmetic: relevance and pairwise similarity are
    * the native cosine QUANTIZED to integers at `rankRoundDp`
    * (`floor(cos·10^dp + 0.5)` — the same primitive floor form every
    * ranked surface uses), λ enters as integer tenths
    * (`λ = lambdaTenths/10` ⇒ score = `lambdaTenths·rel −
    * (10−lambdaTenths)·maxSim`), and the first pick's diversity term
    * is 0 by convention — so the whole greedy trace is integer
    * arithmetic a SQL oracle unrolls step by step. Ties break on the
    * smaller id at every pick.
    *
    * Scale shape: the candidate pool is `candidates` rows (k·refine
    * sized, the answer contract) — ONE corpus-scale
    * TakeOrderedAndProject produces it; the greedy loop is
    * O(candidates·k) driver arithmetic over collected rows, the same
    * budget class as the SQ8/PQ refine passes. The sequential
    * dependence is intrinsic to MMR (pick t depends on picks 1..t−1);
    * distributing it would serialize anyway. */
  def mmr(corpus: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, candidates: Int,
      lambdaTenths: Int = 7, rankRoundDp: Int = 4): DataFrame = {
    require(k >= 1 && candidates >= k,
      s"need candidates ($candidates) >= k ($k) >= 1")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths must be in [0, 10], got $lambdaTenths")
    graft.plans.VectorExpressions.ensureRegistered(corpus.sparkSession)
    val scale = math.pow(10, rankRoundDp)
    val relInt = floor(
      graft.functions.VectorFunctions.cosineSimilarityNative(
        col(vecCol), KnnSearch.litVec(query)) * lit(scale) + lit(0.5))
      .cast("long")
    val cand = corpus
      .select(col(idCol), col(vecCol), relInt.as("__rel"))
      .orderBy(col("__rel").desc, col(idCol))
      .limit(candidates)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    val spark = corpus.sparkSession
    import spark.implicits._
    mmrGreedy(cand, k, lambdaTenths, scale)
      .toDF("rank", "vec_id", "rel", "max_sim", "mmr_score")
  }

  /** pairwise sims in the IDENTICAL interleaved fold as the native
    * cosine expression (and the batch heap closures), quantized the
    * same way — a SQL replay over the same vectors floors to the
    * same integers */
  private def simInt(a: Array[Float], b: Array[Float],
      scale: Double): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val xa = a(i).toDouble; val xb = b(i).toDouble
      dot += xa * xb; na += xa * xa; nb += xb * xb; i += 1
    }
    val cos = if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    math.floor(cos * scale + 0.5).toLong
  }

  /** the greedy MMR trace over a collected candidate pool — shared by
    * [[mmr]] and [[mmrBatch]] so both faces pick identically. */
  private def mmrGreedy(cand: Array[(Long, Array[Float], Long)],
      k: Int, lambdaTenths: Int, scale: Double)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val n = cand.length
    val maxSim = Array.fill(n)(Long.MinValue)
    val picked = Array.fill(n)(false)
    val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    var t = 1
    while (t <= math.min(k, n)) {
      var best = -1
      var bestScore = 0L
      (0 until n).foreach { i =>
        if (!picked(i)) {
          val ms = if (maxSim(i) == Long.MinValue) 0L else maxSim(i)
          val score = lambdaTenths * cand(i)._3 -
            (10 - lambdaTenths) * ms
          if (best < 0 || score > bestScore ||
              (score == bestScore && cand(i)._1 < cand(best)._1)) {
            best = i; bestScore = score
          }
        }
      }
      val ms = if (maxSim(best) == Long.MinValue) 0L else maxSim(best)
      out += ((t.toLong, cand(best)._1, cand(best)._3, ms, bestScore))
      picked(best) = true
      (0 until n).foreach { i =>
        if (!picked(i)) {
          val s = simInt(cand(i)._2, cand(best)._2, scale)
          if (s > maxSim(i)) maxSim(i) = s
        }
      }
      t += 1
    }
    out.result()
  }

  /** Batch face of [[mmr]] — the whole query set's candidate pools
    * come from ONE shared corpus scan: a [[KnnSearch.RawScorer]]
    * returning `−relInt` makes the per-query bounded heaps rank on
    * exactly the single path's (rounded rel DESC, id) key (the
    * negated rounded integer is exact in a double), so each query's
    * pool — and therefore its whole greedy trace — is bit-equal to
    * its single-query [[mmr]] (spec-asserted). The greedy loops stay
    * O(candidates·k) driver arithmetic per query over the collected
    * pools. Output adds `query_id`. */
  def mmrBatch(corpus: DataFrame, vecCol: String, idCol: String,
      queries: Seq[(Long, Seq[Float])], k: Int, candidates: Int,
      lambdaTenths: Int = 7, rankRoundDp: Int = 4): DataFrame = {
    require(queries.nonEmpty, "mmrBatch needs at least one query")
    require(queries.map(_._1).distinct.length == queries.length,
      "mmrBatch: duplicate query ids")
    require(k >= 1 && candidates >= k,
      s"need candidates ($candidates) >= k ($k) >= 1")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths must be in [0, 10], got $lambdaTenths")
    val spark = corpus.sparkSession
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val scale = math.pow(10, rankRoundDp)
    val qSet: Array[(Any, Array[Float])] =
      queries.map { case (qid, qv) => (qid: Any, qv.toArray) }.toArray
    val scorer = KnnSearch.RawScorer { (row, vecIdx, qi, _) =>
      -simInt(row.getSeq[Float](vecIdx).toArray, qSet(qi)._2, scale)
        .toDouble
    }
    val pools = KnnSearch.topKBatchCollected(
        corpus.select(col(idCol), col(vecCol)),
        vecCol, qSet,
        org.apache.spark.sql.types.LongType, candidates,
        tieBreak = idCol, distCol = "__negrel",
        rawScorer = Some(scorer))
      .collect()
      .map(r => (r.getLong(3), // query_id
        (r.getLong(0), r.getSeq[Float](1).toArray,
          -r.getDouble(2).toLong)))
      .groupBy(_._1)
    import spark.implicits._
    queries.flatMap { case (qid, _) =>
      val cand = pools.getOrElse(qid, Array.empty).map(_._2)
        .sortBy(c => (-c._3, c._1))
      mmrGreedy(cand, k, lambdaTenths, scale)
        .map(o => (qid, o._1, o._2, o._3, o._4, o._5))
    }.toDF("query_id", "rank", "vec_id", "rel", "max_sim",
      "mmr_score")
  }
}
