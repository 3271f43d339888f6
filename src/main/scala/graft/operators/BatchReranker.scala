package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Model-backed cross-encoder rerank scaffold — the production shape of
  * V6 that [[Rerank.LexicalScorer]]'s pure-expression path stands in
  * for, symmetric with [[graft.functions.BatchEmbedder]] on the V1
  * side.
  *
  * The reference reranks with BGE-M3 `compute_score` over (query, doc)
  * pairs (/root/reference/src/rag/embedding/bge.py:237-271) — a model
  * with weights and batched inference, which can't be a Catalyst
  * expression. The Spark-native pattern is `mapPartitions`: one model
  * handle per partition, candidates scored in `batchSize` groups. The
  * candidate set is ≤ k·components rows, so in the retrieval pipeline
  * this runs as one tiny task; the same operator scales to corpus-wide
  * scoring jobs (pointwise rerank of a whole table) because it is a
  * narrow transformation.
  *
  * Subclasses implement `loadModel` + `scoreBatch`;
  * [[FakeCrossEncoder]] is the deterministic stand-in used by tests —
  * this container ships no model runtime.
  */
abstract class BatchReranker(val batchSize: Int = 64) extends Serializable {

  /** per-partition model handle (load weights once; share across a JVM's
    * partitions via a singleton in real implementations) */
  protected def loadModel(): AnyRef

  /** batched pairwise scoring: one call per `batchSize` candidates,
    * higher = more relevant */
  protected def scoreBatch(model: AnyRef, query: String,
      docs: Seq[String]): Seq[Double]

  /** Append `scoreCol` (double) by scoring each row's `textCol` against
    * `query` in batches. Null text → null score. Narrow — scoring
    * parallelism equals scan parallelism. */
  def scoreCandidates(candidates: DataFrame, textCol: String,
      query: String, scoreCol: String = "rerank_score"): DataFrame = {
    require(!candidates.columns.contains(scoreCol),
      s"candidates already have a '$scoreCol' column")
    val textIdx = candidates.schema.fieldIndex(textCol)
    val outSchema = StructType(
      candidates.schema.fields :+ StructField(scoreCol, DoubleType))
    val bs = batchSize
    candidates.mapPartitions { rows =>
      val model = loadModel()
      rows.grouped(bs).flatMap { batch =>
        val texts = batch.map(r =>
          if (r.isNullAt(textIdx)) null else r.getString(textIdx))
        val scores = scoreBatch(model, query, texts.filter(_ != null))
        val it = scores.iterator
        batch.map { r =>
          val s: Any = if (r.isNullAt(textIdx)) null else it.next()
          Row.fromSeq(r.toSeq :+ s)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** T3 with a model scorer: score, sort descending (deterministic
    * ties), keep `limit` — the same contract as [[Rerank.rerank]]. */
  def rerank(candidates: DataFrame, textCol: String, query: String,
      limit: Int = Rerank.DefaultRerankLimit, tieBreak: String,
      scoreCol: String = "rerank_score"): DataFrame =
    scoreCandidates(candidates, textCol, query, scoreCol)
      .orderBy(col(scoreCol).desc, col(tieBreak))
      .limit(limit)
}

/** Deterministic fake cross-encoder: token-overlap signal plus an
  * md5-derived jitter in [0, 0.5) — same (query, doc) → same score on
  * any executor, no weights needed; exercises the full batching
  * plumbing while producing plausible-looking rankings. */
case class FakeCrossEncoder(override val batchSize: Int = 64)
    extends BatchReranker(batchSize) {

  protected def loadModel(): AnyRef = "fake-cross-encoder-v1"

  protected def scoreBatch(model: AnyRef, query: String,
      docs: Seq[String]): Seq[Double] = {
    val qTokens = query.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).distinct.toSet
    val md = MessageDigest.getInstance("MD5")
    docs.map { d =>
      val dTokens = d.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).distinct.toSet
      val overlap =
        if (qTokens.isEmpty) 0.0
        else qTokens.intersect(dTokens).size.toDouble / qTokens.size
      md.reset()
      val h = md.digest(s"$query|$d".getBytes("UTF-8"))
      val jitter = ((h(0) & 0xff) << 8 | (h(1) & 0xff)).toDouble / 131072.0
      overlap + jitter
    }
  }
}
