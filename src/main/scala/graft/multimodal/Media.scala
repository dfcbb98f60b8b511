package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal column support: image/audio/video travel as opaque `binary`
  * columns with typed metadata, processed by per-partition batch operators.
  *
  * The actual codec calls are STUBBED behind [[MediaDecoder]] (no image/audio
  * libraries in this environment); [[FakeDecoder]] is a deterministic stand-in
  * (md5-derived pseudo-metadata) so the Spark-side plumbing — schema, encoder,
  * partition-batch shape, operator signatures — is real and testable, and the
  * SQL oracle can reproduce the outputs exactly.
  *
  * Scale design: decode/feature-extract are `mapPartitions` (one decoder
  * instance per partition, amortized across the batch — the Scala analogue of
  * arrow-batched UDFs), so a 100 TB media table distributes as evenly as its
  * row partitioning; nothing collects to the driver.
  */
case class MediaRecord(id: Long, kind: String, payload: Array[Byte])
case class MediaMeta(id: Long, kind: String, n_bytes: Long, checksum: String, width: Int, height: Int)
case class MediaFrame(id: Long, frame_idx: Int, frame_checksum: String)

trait MediaDecoder extends Serializable {
  /** (width, height) of the decoded media. */
  def dimensions(payload: Array[Byte]): (Int, Int)
  /** Fixed-size feature vector (the "embedding" of the media). */
  def features(payload: Array[Byte], dims: Int): Array[Double]
  /** Number of frames to sample (video) / windows (audio). */
  def frameCount(payload: Array[Byte]): Int
  /** Checksum of a single sampled frame. */
  def frameChecksum(payload: Array[Byte], idx: Int): String
}

/** Deterministic fake decode: every output is a pure function of md5(payload),
  * so `width = int(md5[0:2])`, `height = int(md5[2:4])`, frame count
  * `int(md5[4]) % 4 + 1`, features `(int(md5[2i:2i+2]) - 128)/128` — all
  * exactly reproducible in SQL. A real deployment swaps this object for one
  * backed by an actual codec; nothing else changes.
  */
object FakeDecoder extends MediaDecoder {
  def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  private def hexAt(h: String, from: Int, len: Int): Int =
    Integer.parseInt(h.substring(from, from + len), 16)

  override def dimensions(payload: Array[Byte]): (Int, Int) = {
    val h = md5Hex(payload); (hexAt(h, 0, 2), hexAt(h, 2, 2))
  }

  override def features(payload: Array[Byte], dims: Int): Array[Double] = {
    val h = md5Hex(payload)
    Array.tabulate(dims)(i => (hexAt(h, 2 * i, 2) - 128) / 128.0)
  }

  override def frameCount(payload: Array[Byte]): Int = {
    val h = md5Hex(payload); hexAt(h, 4, 1) % 4 + 1
  }

  override def frameChecksum(payload: Array[Byte], idx: Int): String =
    md5Hex((md5Hex(payload) + ":" + idx).getBytes("UTF-8"))
}

object Media {
  implicit val metaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
  implicit val frameEnc: Encoder[MediaFrame] = Encoders.product[MediaFrame]

  /** Decode metadata per partition batch (one decoder per partition). */
  def decodeMeta(ds: Dataset[MediaRecord], dec: MediaDecoder): Dataset[MediaMeta] =
    ds.mapPartitions { it =>
      it.map { r =>
        val (w, h) = dec.dimensions(r.payload)
        MediaMeta(r.id, r.kind, r.payload.length.toLong, FakeDecoder.md5Hex(r.payload), w, h)
      }
    }

  /** Sample frames: one input row fans out to frameCount rows. */
  def sampleFrames(ds: Dataset[MediaRecord], dec: MediaDecoder): Dataset[MediaFrame] =
    ds.mapPartitions { it =>
      it.flatMap { r =>
        (0 until dec.frameCount(r.payload)).iterator
          .map(i => MediaFrame(r.id, i, dec.frameChecksum(r.payload, i)))
      }
    }
}
