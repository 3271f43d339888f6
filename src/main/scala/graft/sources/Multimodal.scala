package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — the north-star "image/audio/video as
  * opaque binary columns with typed metadata" extension (builder brief).
  *
  * The Spark-side architecture is real and tested: media rows are
  * `(media_id, kind, payload binary)`, decode/feature-extract runs as
  * `mapPartitions` over batches (one decoder instance per partition — the
  * same executor-singleton shape a real codec or model would need), frame
  * sampling is a pure `posexplode` over a sequence, and outputs carry a
  * typed metadata struct. The DECODER ITSELF IS A STUB: this container
  * has no image/audio libraries, so payloads use a deterministic fake
  * container format (`GRFT|width|height|format|body`) and
  * [[Multimodal.decodePartition]] parses that. Swapping in a real codec
  * changes only the body of `decodePartition` — no plan shape, schema, or
  * partitioning changes.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      format: String, n_body_bytes: Int)

  val Magic = "GRFT"

  /** Build a deterministic fake payload (the stand-in for real encoded
    * media bytes). */
  def encodeFake(width: Int, height: Int, format: String,
      body: Array[Byte]): Array[Byte] =
    (s"$Magic|$width|$height|$format|".getBytes("UTF-8")) ++ body

  /** STUB decode — parses the fake container header. A real
    * implementation calls the codec here; everything around it (batching,
    * schema, null handling) is production plumbing. */
  def decodePartition(rows: Iterator[MediaRow]): Iterator[DecodedMedia] = {
    // per-partition setup happens once here (real impl: load codec/model)
    rows.map { r =>
      val s = new String(r.payload, "UTF-8")
      val parts = s.split("\\|", 5)
      require(parts.length == 5 && parts(0) == Magic,
        s"not a $Magic payload for media_id=${r.media_id}")
      DecodedMedia(r.media_id, r.kind, parts(1).toInt, parts(2).toInt,
        parts(3), parts(4).getBytes("UTF-8").length)
    }
  }

  /** Distributed decode: narrow mapPartitions, no shuffle — decode
    * parallelism equals scan parallelism. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(decodePartition)
  }

  /** Synthesize a deterministic media table from the documents table
    * (fixture generator for the plumbing): dimensions derive from doc_id,
    * body from the text bytes. */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio"
          else "video"
        val fmt = kind match {
          case "image" => "png"; case "audio" => "wav"; case _ => "mkv"
        }
        MediaRow(id, kind,
          encodeFake((id % 640 + 16).toInt, (id % 480 + 16).toInt, fmt,
            text.getBytes("UTF-8")))
      }
  }

  /** Frame sampling plumbing: every `stride`-th frame index of a video of
    * `nFrames` frames — pure posexplode, no decode needed to plan the
    * extraction jobs. */
  def sampleFrames(media: DataFrame, nFramesCol: Column, stride: Int)
      : DataFrame =
    media.select(col("media_id"),
      posexplode(sequence(lit(0), nFramesCol - 1, lit(stride)))
        .as(Seq("sample_idx", "frame_idx")))

  case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      format: String, n_body_bytes: Int)

  /** Aspect-preserving downscale INTO a `tw`×`th` box, in pure integer
    * arithmetic so any engine replays the dims exactly: media already
    * inside the box passes through; otherwise the binding axis is the
    * one with the smaller scale ratio (compared cross-multiplied:
    * `tw·h ≤ th·w` → width binds) and the other dimension is the
    * truncating-division rescale. The body is NOT re-encoded here — the
    * stub tracks the byte count a real resampler would produce
    * (area-proportional, truncating), which is the part the pipeline
    * plans on (shuffle sizing, storage estimates). A real implementation
    * replaces the byte-count model with the codec call; schema,
    * batching, and the narrow no-shuffle shape stay. */
  def resizePartition(tw: Int, th: Int)(
      rows: Iterator[DecodedMedia]): Iterator[ResizedMedia] = {
    require(tw > 0 && th > 0, s"resize box must be positive, got ($tw,$th)")
    rows.map { m =>
      val (w, h) = (m.width, m.height)
      val (nw, nh) =
        if (w <= tw && h <= th) (w, h)
        else if (tw.toLong * h <= th.toLong * w)
          (tw, (h.toLong * tw / w).toInt)
        else ((w.toLong * th / h).toInt, th)
      val nBytes =
        (m.n_body_bytes.toLong * (nw.toLong * nh) / (w.toLong * h)).toInt
      ResizedMedia(m.media_id, m.kind, nw, nh, m.format, nBytes)
    }
  }

  /** Distributed resize: narrow mapPartitions over decoded metadata —
    * composes with [[decode]] without a shuffle between the stages. */
  def resize(decoded: Dataset[DecodedMedia], tw: Int, th: Int)
      : Dataset[ResizedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(resizePartition(tw, th))
  }

  case class MediaFeatures(
      media_id: Long, kind: String, f0: Long, f1: Long, f2: Long, f3: Long)

  /** STUB feature extraction — the "embed the decoded media" model seam,
    * fused with decode in ONE partition pass (decode→embed with no
    * materialized intermediate, exactly how a real vision/audio encoder
    * batches). The fake features are four 32-bit words of the body's md5
    * (deterministic, so the pipeline is hash-oracle-checkable
    * end-to-end); a real model replaces the digest with an inference
    * call — per-partition setup (here: the MessageDigest instance) is
    * already where the model load belongs. */
  def featuresPartition(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { r =>
      val s = new String(r.payload, "UTF-8")
      val parts = s.split("\\|", 5)
      require(parts.length == 5 && parts(0) == Magic,
        s"not a $Magic payload for media_id=${r.media_id}")
      md.reset()
      val hex = md.digest(parts(4).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      def word(i: Int): Long =
        java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16)
      MediaFeatures(r.media_id, r.kind, word(0), word(1), word(2), word(3))
    }
  }

  /** Distributed decode→featurize: narrow, one digest/model instance per
    * partition. */
  def features(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(featuresPartition)
  }
}
