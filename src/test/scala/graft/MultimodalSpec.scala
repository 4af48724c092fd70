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

  test("resize keeps schema and rewrites metadata") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val resized = Multimodal.resizeAll(spark, media, 224, 224)
    // same columns and types in, same out (nullability flags may
    // tighten through the typed Encoder round-trip)
    assert(resized.schema.map(f => (f.name, f.dataType)) ==
      media.schema.map(f => (f.name, f.dataType)))
    val dims = resized.toDF().select("width", "height").distinct().collect()
    assert(dims.length == 1 && dims(0).getInt(0) == 224 && dims(0).getInt(1) == 224)
    assert(resized.toDF().where(org.apache.spark.sql.functions
      .col("codec").endsWith(";resized")).count() == media.count())
  }

  test("frame sampling shrinks only video payloads, by the stride") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val sampled = Multimodal.frameSampleVideos(spark, media, stride = 4).toDF()
    val joined = media.select(col("media_id"), col("modality"),
        length(col("payload")).as("len0"))
      .join(sampled.select(col("media_id"), length(col("payload")).as("len1")),
        "media_id")
    // video payloads shrink to ceil(n/4); others are untouched
    val badVideo = joined.where(col("modality") === "video" &&
      col("len1") =!= ceil(col("len0") / 4.0).cast("int")).count()
    val badOther = joined.where(col("modality") =!= "video" &&
      col("len1") =!= col("len0")).count()
    assert(badVideo == 0 && badOther == 0)
  }
}
