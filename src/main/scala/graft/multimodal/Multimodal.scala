package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2, multimodal block).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct riding alongside — the schema a 100 TB image/audio corpus
  * actually uses (payload bytes + modality + dims + codec). The
  * DECODE STEP IS STUBBED: real image/audio codecs are not available
  * in this environment by design, so `decodeStub` derives
  * deterministic fake features from the bytes. Everything around the
  * stub — schema, typed Dataset, per-partition batched processing,
  * feature schema — is real and tested.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      modality: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      codec: String)

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      checksum: Long,
      feat: Array[Float])

  /** Build a media table from `documents`: payload = utf-8 bytes of the
    * text (a stand-in for real image/audio bytes), metadata derived
    * deterministically. At scale this would be `spark.read.format
    * ("binaryFile")` or parquet with a binary column. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(64)) + 1).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height"),
      lit("raw").as("codec"))

  /** STUB decoder: a real pipeline would decode image bytes / sample
    * audio frames here (e.g. via a JNI codec or a vectorized Python
    * worker). This fake is deterministic — byte-sum checksum + an
    * 8-dim feature from byte histogram buckets — so tests can assert
    * exact results while exercising the real batching path. */
  def decodeStub(rec: MediaRecord): MediaFeatures = {
    val bytes = rec.payload
    var checksum = 0L
    val hist = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      checksum = checksum * 31 + b
      hist(b % 8) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1)
    MediaFeatures(rec.media_id, rec.modality, bytes.length, checksum,
      hist.map(_ / n))
  }

  /** Feature extraction as a typed per-partition pipeline —
    * `mapPartitions` so a real decoder could amortize codec init per
    * partition (the Scala analogue of a batched Python UDF). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real impl: initialize decoder/codec once per partition here
      it.map(decodeStub)
    }
  }

  case class MediaHash(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      phash: Long)

  /** AVERAGE-HASH perceptual fingerprint (the aHash family: bit i set
    * iff component i sits strictly above the mean) over the stub
    * decoder's 8-bin byte histogram — the real algorithm on the stub
    * feature, so the hash survives byte-order-preserving perturbations
    * (any permutation of the payload hashes identically, the stand-in
    * for "same image, different encoder run"). INTEGER-EXACT: bit i is
    * `8·h[i] > n` — no float mean, so the oracle reproduces every bit
    * from character counts alone. */
  def phashStub(rec: MediaRecord): MediaHash = {
    val bytes = rec.payload
    val hist = new Array[Int](8)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % 8) += 1
      i += 1
    }
    var ph = 0L
    var b = 0
    while (b < 8) {
      if (8L * hist(b) > bytes.length) ph |= (1L << b)
      b += 1
    }
    MediaHash(rec.media_id, rec.modality, bytes.length, ph)
  }

  /** Perceptual hashing as the same typed per-partition pipeline shape
    * as extractFeatures. */
  def perceptualHash(spark: SparkSession, media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(phashStub))
  }

  /** STUB resize: a real pipeline decodes + bilinear-resamples the
    * image here. The stub scales the metadata and re-tags the codec —
    * deterministic, so the plumbing (schema in = schema out, per-
    * partition execution) is exactly testable. */
  def resizeStub(rec: MediaRecord, w: Int, h: Int): MediaRecord =
    rec.copy(width = w, height = h, codec = s"${rec.codec};resized")

  /** Typed resize over a media table — same mapPartitions shape as
    * extractFeatures; at scale the decoder init amortizes per
    * partition, not per row. */
  def resizeAll(
      spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(resizeStub(_, w, h)))
  }

  /** STUB frame sampling: every `stride`-th byte stands in for every
    * stride-th video frame. Keeps payload size proportional, so
    * partition-size reasoning stays realistic. */
  def frameSampleStub(rec: MediaRecord, stride: Int): MediaRecord = {
    val sampled = rec.payload.indices.collect {
      case i if i % stride == 0 => rec.payload(i)
    }.toArray
    rec.copy(payload = sampled, codec = s"${rec.codec};sampled/$stride")
  }

  /** Frame-sample the video rows, pass others through — the mixed-
    * modality branch a real pipeline runs (filter pushdown applies:
    * only `video` rows pay the sampling cost). */
  def frameSampleVideos(
      spark: SparkSession, media: DataFrame, stride: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    val typed = media.as[MediaRecord]
    typed.mapPartitions(_.map { r =>
      if (r.modality == "video") frameSampleStub(r, stride) else r
    })
  }
}
