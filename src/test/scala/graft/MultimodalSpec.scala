package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing specs: schema, deterministic stub decode, and
  * plan-shape properties (payload bytes never fan out).
  */
class MultimodalSpec extends SparkSpec {

  test("media table: schema and kind assignment") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "kind", "payload", "n_chars"))
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("stub decode is deterministic and preserves row count") {
    val m = Multimodal.mediaTable(spark, sfDir)
    val f1 = Multimodal.decodeFeatures(m).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(m).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == m.count())
    assert(f1.forall(r => r.n_bytes > 0 && r.width >= 64 && r.height >= 48))
    assert(f1.filter(_.kind == "audio").forall(_.channels == 1))
  }

  test("resize stub never upscales and respects bounds") {
    val f = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
    val r = Multimodal.resizeStub(f, 128, 128).collect()
    assert(r.forall { row =>
      val outW = row.getAs[Int]("out_w"); val outH = row.getAs[Int]("out_h")
      outW <= 128 && outH <= 128 &&
        outW <= row.getAs[Int]("width") && outH <= row.getAs[Int]("height")
    })
  }

  test("frame sample emits only video rows with bounded fan-out") {
    val m = Multimodal.mediaTable(spark, sfDir)
    val frames = Multimodal.frameSample(m)
    // frame rows carry only ids/indices, never the payload column
    assert(frames.schema.fieldNames.toSeq == Seq("media_id", "frame_idx"))
    val nVideos = m.filter(org.apache.spark.sql.functions.col("kind") === "video").count()
    val byMedia = frames.groupBy("media_id").count().collect()
    assert(byMedia.length == nVideos)
    assert(byMedia.forall(_.getLong(1) >= 1))
  }
}
