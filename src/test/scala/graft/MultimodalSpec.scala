package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** The multimodal plumbing: schema, typed mapPartitions pipeline, and
  * the deterministic stub decoder. */
class MultimodalSpec extends SparkSpec {

  test("decodeStub is deterministic and exact") {
    val rec = Multimodal.MediaRecord(7L, "image", "abc".getBytes("UTF-8"), 4, 3, "raw")
    val f = Multimodal.decodeStub(rec)
    // checksum = (('a'*31) + 'b')*31 + 'c' = (97*31+98)*31+99
    assert(f.checksum == (97L * 31 + 98) * 31 + 99)
    assert(f.n_bytes == 3)
    assert(f.feat.sum > 0.99f && f.feat.sum < 1.01f) // histogram normalized
  }

  test("end-to-end media pipeline over documents") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, media)
    val n = feats.count()
    assert(n == Tables.documents(spark, sf).count())
    val mods = feats.toDF().select("modality").distinct()
      .collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }
}
