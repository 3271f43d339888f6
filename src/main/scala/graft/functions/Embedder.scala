package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.functions.VectorFunctions.normalize

/** Text-embedding interface — SURVEY.md §2.8 V1/V2, mirroring the
  * reference's `Embeddings.embed_documents/embed_query` trait
  * (/root/reference/src/rag/embedding/base.py:21-66) with its pluggable
  * backends (local model / Ollama / OpenAI-compatible API).
  *
  * The engine's default is [[HashEmbedder]]: a deterministic
  * hash-projection to unit vectors, pure `functions._` all the way down —
  * no model weights, no UDF, fully codegen'd. That mirrors the reference's
  * offline "default" model path (embedding/base.py:43-45) while staying
  * reproducible for tests and oracles. A real model backend plugs in as
  * another implementation (typically `mapPartitions` with one model per
  * executor — batched inference, model loaded once per JVM, the Scala
  * analogue of the reference's config-hash-keyed instance cache,
  * embedding/base.py:18-39).
  */
trait Embedder {
  /** embedding dimension (reference: 1024 API / 384 local,
    * config.py:53) */
  def dim: Int

  /** V1: column expression mapping a text column to `array<float>` of
    * [[dim]] unit-norm values. */
  def embedCol(text: Column): Column

  /** V2: embed one query string (driver-side, one tiny local job —
    * the analogue of the reference's single query-embedding call,
    * doc_embedder.py:222-234). */
  def embedQuery(spark: SparkSession, text: String): Seq[Float] = {
    import spark.implicits._
    Seq(text).toDF("q").select(embedCol(col("q"))).head().getSeq[Float](0)
  }
}

/** Deterministic hash-projection embedder: token j-th feature is a
  * xxhash64-derived value in [-1, 1); features sum over tokens and the
  * vector is L2-normalized. Same text → same vector, on any cluster, in
  * any session — no dictionary, no state, so it distributes as a pure
  * per-row expression (scan-bound at 100 TB).
  */
case class HashEmbedder(dim: Int = 64) extends Embedder {
  def embedCol(text: Column): Column = {
    val ts = tokens(lower(text))
    val raw = transform(sequence(lit(0), lit(dim - 1)), j =>
      aggregate(ts, lit(0.0), (s, t) =>
        s + (pmod(xxhash64(t, j), lit(1000)).cast("double") / 500.0 - 1.0)))
    normalize(raw).cast("array<float>")
  }
}
