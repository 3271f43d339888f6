package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** Model-backed embedding scaffold — the production shape of V1 that
  * [[HashEmbedder]]'s pure-expression path stands in for.
  *
  * A real embedding model can't be a Catalyst expression: it has weights
  * to load and wants batched inference. The Spark-native pattern is
  * `mapPartitions`: one model instance per partition (load once, amortized
  * over the split), texts grouped into inference batches — the analogue of
  * the reference's config-hash-keyed embedder cache + batch loop
  * (/root/reference/src/rag/embedding/base.py:18-66,
  * doc_embedder.py:152-165; its local BGE path ran batch_size=1, a known
  * bottleneck — the default here is the reference's UI batch of 64).
  *
  * Subclasses implement `loadModel` + `inferBatch`; everything else —
  * batching, schema, null handling, narrow (no-shuffle) execution — is
  * fixed plumbing. [[FakeModelEmbedder]] is the deterministic stand-in
  * (md5-derived unit vectors) used by tests; this container ships no
  * model runtime.
  */
abstract class BatchEmbedder(val dim: Int, val batchSize: Int = 64)
    extends Serializable {

  /** The per-partition model handle. A real implementation loads weights
    * here (called once per partition; cache in a JVM singleton to share
    * across partitions of the same executor). */
  protected def loadModel(): AnyRef

  /** Batched inference: one call per `batchSize` texts. */
  protected def inferBatch(model: AnyRef, texts: Seq[String])
      : Seq[Array[Float]]

  /** Append `outCol` (array<float>) to `docs` by running batched
    * inference partition-by-partition. Narrow transformation — embedding
    * parallelism equals scan parallelism. Null text → null vector. */
  def embedDocuments(docs: DataFrame, textCol: String,
      outCol: String = "embedding"): DataFrame = {
    require(!docs.columns.contains(outCol),
      s"input already has a '$outCol' column")
    val textIdx = docs.schema.fieldIndex(textCol)
    val outSchema = StructType(
      docs.schema.fields :+ StructField(outCol, ArrayType(FloatType)))
    val bs = batchSize
    docs.mapPartitions { rows =>
      val model = loadModel() // once per partition
      rows.grouped(bs).flatMap { batch =>
        val texts = batch.map(r =>
          if (r.isNullAt(textIdx)) null else r.getString(textIdx))
        val vecs = inferBatch(model, texts.filter(_ != null))
        val it = vecs.iterator
        batch.map { r =>
          val v = if (r.isNullAt(textIdx)) null else it.next()
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(Encoders.row(outSchema))
  }
}

/** Deterministic fake "model": md5-derived unit vectors. Same text →
  * same vector on any executor, no weights needed — exercises the full
  * plumbing. */
case class FakeModelEmbedder(override val dim: Int = 64,
    override val batchSize: Int = 64)
    extends BatchEmbedder(dim, batchSize) {

  protected def loadModel(): AnyRef = "fake-model-v1"

  protected def inferBatch(model: AnyRef, texts: Seq[String])
      : Seq[Array[Float]] =
    texts.map { t =>
      val md = MessageDigest.getInstance("MD5")
      val raw = Array.tabulate(dim) { j =>
        val h = md.digest(s"$j|$t".getBytes("UTF-8"))
        // first 4 bytes as a signed int scaled to [-1, 1]
        val x = ((h(0) & 0xff) << 24) | ((h(1) & 0xff) << 16) |
          ((h(2) & 0xff) << 8) | (h(3) & 0xff)
        x.toFloat / Int.MaxValue
      }
      val norm = math.sqrt(raw.map(x => x.toDouble * x).sum)
      if (norm == 0.0) raw else raw.map(x => (x / norm).toFloat)
    }
}
