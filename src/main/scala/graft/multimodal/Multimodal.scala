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

  case class MediaPHash(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      ahash: Long,
      dhash: Long)

  /** Planted-image dimensions: 16×16 → 2×2 blocks under the 8×8 hash
    * grid. */
  val BmpDim: Int = 16

  /** Deterministic planted grayscale pixels for doc `d` — the
    * driver-planted image corpus the BMP pipeline runs on. Class
    * structure: 7 pixel-pattern classes keyed by d % 7 (the affine
    * ramp base*i + 3x + 5y mod 256 — nonlinear enough across classes
    * that all 7 aHashes are distinct), and a +1 single-pixel jitter on
    * half of each class (d % 14 ≥ 7) that perturbs the payload md5 but
    * provably flips no aHash bit (block margins ≥ 256 against a ±1
    * change; spec-pinned per class) — the "same image, different
    * encoder run" near-dup the perceptual hash exists to catch. Pure
    * integer arithmetic, so the oracle replants identical pixels. */
  def plantedPixels(d: Long): Array[Int] = {
    val base = (d % 7) * 17 + 1
    val pix = Array.tabulate(BmpDim * BmpDim) { i =>
      val x = i % BmpDim
      val y = i / BmpDim
      ((base * i + 3 * x + 5 * y) % 256).toInt
    }
    if (d % 14 >= 7) {
      val j = 3 * BmpDim + 5
      pix(j) = (pix(j) + 1) % 256
    }
    pix
  }

  /** Media table with REAL 24-bpp BMP payloads: each document plants a
    * deterministic 16×16 grayscale image, encoded through the real
    * codec — so everything downstream (decode, hash, dedup) operates
    * on genuine image bytes with headers, bottom-up rows and padding,
    * not on a stand-in. Same typed mapPartitions shape as the other
    * media stages. */
  def bmpMediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { d =>
        val modality =
          if (d % 3 == 0) "image" else if (d % 3 == 1) "audio" else "video"
        MediaRecord(d, modality, Bmp.encodeGray(BmpDim, BmpDim, plantedPixels(d)),
          BmpDim, BmpDim, "bmp")
      }
    }
  }

  /** REAL perceptual hashing: decode the BMP payload (header parse,
    * bottom-up rows, padding), then aHash + dHash over the decoded
    * pixels — the typed per-partition pipeline a production image
    * pipeline runs, with codec init amortized per partition. */
  def perceptualHashBmp(spark: SparkSession, media: DataFrame): Dataset[MediaPHash] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { rec =>
      val img = Bmp.decodeGray(rec.payload)
      MediaPHash(rec.media_id, rec.modality, rec.payload.length,
        Bmp.aHash(img), Bmp.dHash(img))
    })
  }

  /** REAL resize for BMP payloads: decode → integer-exact resample
    * (box-mean downsample / nearest-neighbor otherwise, Bmp.resizeGray)
    * → re-encode, as the same typed per-partition pipeline — the
    * resize stage of a production image pipeline running on genuinely
    * decoded pixels (BmpSpec pins the kernel against hand-computed
    * block means). The generic `resizeStub` below remains the
    * metadata-only path for the codecs absent in this environment. */
  def resizeBmp(
      spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { rec =>
      val img = Bmp.resizeGray(Bmp.decodeGray(rec.payload), w, h)
      rec.copy(payload = Bmp.encodeGray(w, h, img.pix),
        width = w, height = h, codec = rec.codec)
    })
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

  // ------------------------------------------------------------- audio

  /** Planted-audio sample rate (kept low so the corpus stays small). */
  val WavRate: Int = 8000

  /** Deterministic planted PCM-16 samples for doc `d` — the audio
    * analog of [[plantedPixels]]. Layout: every 5th doc is STEREO
    * (interleaved frames), the rest mono; 64 + 2·(d % 32) total
    * samples (always even, so stereo frame counts stay integral);
    * sample i = ((d%7+1)·7919·i + d%997) mod 2¹⁶ − 2¹⁵ — the
    * multiplier wraps the 16-bit range several times per clip, so
    * every class has real sign crossings. Pure integer arithmetic,
    * replanted verbatim by the DuckDB oracle. */
  def plantedSamples(d: Long): Array[Short] = {
    val a = (d % 7 + 1) * 7919L
    val b = d % 997
    val n = (64 + 2 * (d % 32)).toInt
    Array.tabulate(n)(i => (((a * i + b) % 65536L) - 32768L).toShort)
  }

  def plantedChannels(d: Long): Int = if (d % 5 == 0) 2 else 1

  /** Media table with REAL WAV payloads: each document plants a
    * deterministic PCM-16 clip encoded through the real codec
    * (RIFF/fmt/data chunks, little-endian interleaved samples) — the
    * audio twin of [[bmpMediaFromDocuments]]. width carries channels,
    * height the total sample count. */
  def wavMediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { d =>
        val samples = plantedSamples(d)
        MediaRecord(d, "audio",
          Wav.encodePcm16(WavRate, plantedChannels(d), samples),
          plantedChannels(d), samples.length, "wav")
      }
    }
  }

  final case class MediaAudioFeatures(
      media_id: Long,
      channels: Int,
      sample_rate: Int,
      n_bytes: Int,
      n_samples: Int,
      duration_ms: Long,
      peak: Long,
      energy: Long,
      zero_cross: Long,
      rms: Double)

  /** REAL audio feature extraction: decode the WAV payload (chunk
    * walk, PCM-16 validation, channel interleave) and compute the
    * signal features — typed per-partition pipeline, codec init
    * amortized per partition, only (id, small feature row) leaves the
    * decode stage; payload bytes never shuffle. */
  def audioFeaturesWav(spark: SparkSession, media: DataFrame): Dataset[MediaAudioFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { rec =>
      val audio = Wav.decodePcm16(rec.payload)
      val f = Wav.features(audio)
      MediaAudioFeatures(rec.media_id, f.channels, f.sampleRate,
        rec.payload.length, f.nSamples, f.durationMs, f.peak, f.energy,
        f.zeroCross, f.rms)
    })
  }
}
