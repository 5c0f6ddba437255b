package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal pipeline shapes: deterministic decode, frame sampling,
  * feature extraction consumable by similarity search. */
class MultimodalSpec extends SparkTestBase {

  private def docs = spark.createDataFrame(Seq(
    (0L, "hello world", "a", "en"),
    (1L, "a somewhat longer document body here", "a", "en"),
    (2L, "x", "b", "en"))).toDF("doc_id", "text", "source", "lang")

  test("decode is deterministic and length-derived") {
    val m = Multimodal.decodeMeta(spark, docs).collect()
      .map(x => x.doc_id -> x).toMap
    assert(m(0L).n_bytes == 11)
    assert(m(0L).width == 64 + 11 % 512)
    assert(m(0L).format == "jpeg" && m(1L).format == "png" && m(2L).format == "webp")
    assert(m(2L).n_frames == 1 + 1 % 30)
  }

  test("frame sampling explodes every k-th frame with floor offsets") {
    val f = Multimodal.sampleFrames(spark, docs, every = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("byte_offset")))
    // doc 0: 11 bytes -> n_frames = 12, frames 0,3,6,9
    val d0 = f.filter(_._1 == 0L).map(x => (x._2, x._3)).sorted.toSeq
    assert(d0 == Seq((0L, 0L), (3L, 2L), (6L, 5L), (9L, 8L)))
  }

  test("resize fits the box preserving aspect with floor arithmetic") {
    val r = Multimodal.resize(spark, docs, box = 224).collect()
      .map(x => x.doc_id -> x).toMap
    r.values.foreach { x =>
      assert(math.max(x.out_w, x.out_h) == 224L, s"long side must hit the box: $x")
      assert(x.out_w <= 224L && x.out_h <= 224L && x.out_w >= 1L && x.out_h >= 1L)
      assert(x.out_bytes == x.out_w * x.out_h * 3)
      // aspect preserved under integer floor
      if (x.width >= x.height)
        assert(x.out_h == x.height * 224 / x.width)
      else
        assert(x.out_w == x.width * 224 / x.height)
    }
  }

  test("extracted features feed cosine top-k directly") {
    val feats = Multimodal.extractFeatures(spark, docs, dim = 8)
      .withColumnRenamed("doc_id", "vec_id")
      .withColumnRenamed("feature", "embedding")
    val out = VectorOps.cosineTopK(feats, feats.where(col("vec_id") === 0), 2)
      .collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSet.subsetOf(Set(1L, 2L)))
    assert(out.length == 2)
  }
}
