package graft

import graft.multimodal.{Bmp, Multimodal}

/** The real BMP codec: hand-constructed byte fixture, round-trip,
  * planted-class hash pins, and the jitter near-dup contract behind
  * q_media_phash_dedup. */
class BmpSpec extends SparkSpec {

  test("decode: hand-constructed 3x2 bottom-up BMP with row padding") {
    // width 3 -> 9 pixel bytes per row, padded to stride 12.
    // Image (top-down): row0 = 10, 20, 30 ; row1 = 40, 50, 60.
    // Stored bottom-up: file row 0 is image row 1.
    val px = Array(
      // bottom row first (image row 1), BGR each, 3 pad bytes
      40, 40, 40, 50, 50, 50, 60, 60, 60, 0, 0, 0,
      // image row 0
      10, 10, 10, 20, 20, 20, 30, 30, 30, 0, 0, 0)
    val header = new Array[Int](54)
    header(0) = 'B'; header(1) = 'M'
    val size = 54 + px.length
    header(2) = size & 0xff; header(3) = size >> 8
    header(10) = 54 // data offset
    header(14) = 40 // info header size
    header(18) = 3 // width
    header(22) = 2 // height (positive -> bottom-up)
    header(26) = 1 // planes
    header(28) = 24 // bpp
    val bytes = (header ++ px).map(_.toByte)
    val img = Bmp.decodeGray(bytes)
    assert(img.width == 3 && img.height == 2)
    assert(img.pix.toSeq == Seq(10, 20, 30, 40, 50, 60), img.pix.toSeq)
  }

  test("decode: negative height means top-down row order") {
    val enc = Bmp.encodeGray(8, 8, Array.tabulate(64)(identity))
    // flip to top-down: height = -8, rows already bottom-up in enc, so
    // a top-down reader must see the REVERSED row order
    val flipped = enc.clone()
    val h = -8
    flipped(22) = (h & 0xff).toByte
    flipped(23) = ((h >> 8) & 0xff).toByte
    flipped(24) = ((h >> 16) & 0xff).toByte
    flipped(25) = ((h >> 24) & 0xff).toByte
    val img = Bmp.decodeGray(flipped)
    val expected = (0 until 8).reverse.flatMap(r => (0 until 8).map(c => r * 8 + c))
    assert(img.pix.toSeq == expected, img.pix.take(16).toSeq)
  }

  test("encode/decode round-trips every planted class exactly") {
    (0L until 14L).foreach { d =>
      val pix = Multimodal.plantedPixels(d)
      val img = Bmp.decodeGray(Bmp.encodeGray(16, 16, pix))
      assert(img.width == 16 && img.height == 16)
      assert(img.pix.toSeq == pix.toSeq, s"round-trip mismatch for doc $d")
    }
  }

  test("aHash/dHash pin the hand-computed class-0 values") {
    // independently computed from the planted arithmetic (see the
    // oracle): class 0 (base 1) -> ahash 0x3ffffffc0000, dhash
    // 0xfffa9fffffffff
    val img = Bmp.decodeGray(Bmp.encodeGray(16, 16, Multimodal.plantedPixels(0L)))
    assert(Bmp.aHash(img) == 0x3ffffffc0000L, f"ahash ${Bmp.aHash(img)}%016x")
    assert(Bmp.dHash(img) == 0xfffa9fffffffffL, f"dhash ${Bmp.dHash(img)}%016x")
  }

  test("seven planted classes produce seven distinct aHashes") {
    val hashes = (0L until 7L).map { d =>
      Bmp.aHash(Bmp.decodeGray(Bmp.encodeGray(16, 16, Multimodal.plantedPixels(d))))
    }
    assert(hashes.distinct.size == 7, hashes.map(h => f"$h%016x"))
  }

  test("jitter variant: different bytes, same aHash — in every class") {
    (0L until 7L).foreach { d =>
      val plain = Bmp.encodeGray(16, 16, Multimodal.plantedPixels(d))
      val jit = Bmp.encodeGray(16, 16, Multimodal.plantedPixels(d + 7L))
      assert(!plain.sameElements(jit), s"class $d: jitter changed no byte")
      assert(Bmp.aHash(Bmp.decodeGray(plain)) == Bmp.aHash(Bmp.decodeGray(jit)),
        s"class $d: jitter flipped an aHash bit")
    }
  }

  test("resize: box-mean 4x4 -> 2x2 matches hand-computed means") {
    val img = Bmp.GrayImage(4, 4, Array(
      0, 10, 20, 30,
      40, 50, 60, 70,
      80, 90, 100, 110,
      120, 130, 140, 150))
    val r = Bmp.resizeGray(img, 2, 2)
    // block means: (0+10+40+50)/4=25, (20+30+60+70)/4=45,
    //              (80+90+120+130)/4=105, (100+110+140+150)/4=125
    assert(r.pix.toSeq == Seq(25, 45, 105, 125), r.pix.toSeq)
  }

  test("resize: non-divisible target falls back to nearest-neighbor") {
    val img = Bmp.GrayImage(4, 4, Array.tabulate(16)(identity))
    val r = Bmp.resizeGray(img, 3, 3)
    // src index = floor(dst*4/3): 0,1,2 per axis
    assert(r.pix.toSeq == Seq(0, 1, 2, 4, 5, 6, 8, 9, 10), r.pix.toSeq)
  }

  test("resizeBmp: decode -> resample -> re-encode round-trips through the codec") {
    import spark.implicits._
    val docs = (0L until 14L).toDF("doc_id")
    val media = Multimodal.bmpMediaFromDocuments(spark, docs)
    val resized = Multimodal.resizeBmp(spark, media.toDF(), 8, 8).collect()
    assert(resized.forall(r => r.width == 8 && r.height == 8))
    resized.foreach { r =>
      val img = Bmp.decodeGray(r.payload)
      assert(img.width == 8 && img.height == 8)
      val expected = Bmp.resizeGray(
        Bmp.decodeGray(Bmp.encodeGray(16, 16,
          Multimodal.plantedPixels(r.media_id))), 8, 8)
      assert(img.pix.toSeq == expected.pix.toSeq,
        s"doc ${r.media_id}: resized pixels drifted through the codec")
    }
  }

  test("phash groups are supersets of exact byte-dup groups") {
    import spark.implicits._
    val docs = (0L until 56L).toDF("doc_id")
    val media = Multimodal.bmpMediaFromDocuments(spark, docs)
    val hashes = Multimodal.perceptualHashBmp(spark, media.toDF())
      .collect().map(h => h.media_id -> h).toMap
    val payload = media.collect().map(r => r.media_id -> r.payload).toMap
    for (a <- 0L until 56L; b <- (a + 1) until 56L) {
      if (payload(a).sameElements(payload(b)))
        assert(hashes(a).ahash == hashes(b).ahash,
          s"byte-identical $a/$b in different phash groups")
    }
    // and the planted classes group as designed: same d%7 <-> same ahash
    for (a <- 0L until 56L; b <- (a + 1) until 56L) {
      assert((hashes(a).ahash == hashes(b).ahash) == (a % 7 == b % 7),
        s"grouping mismatch for $a/$b")
    }
  }
}
