package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batched partition passes.
  *
  * The Spark-side shape is the real thing — binary columns, a typed
  * `mapPartitions` decode stage (one decoder instance per partition,
  * streamed batches, no driver collect), a typed metadata schema.
  * The decoder itself is a STUB: this container has no image/audio
  * codecs, so [[FakeDecoder.decode]] derives deterministic
  * pseudo-metadata from the payload bytes. Swapping in a real codec
  * changes only the body of `decode`.
  */
object Multimodal {

  /** Decoded-media metadata row. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       format: String, n_frames: Int)

  /** STUB decoder — deterministic pseudo-decode from payload bytes.
    * A real implementation would parse the container header; the
    * arithmetic here is intentionally reproducible in the oracle. */
  object FakeDecoder {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      MediaMeta(
        doc_id = docId,
        n_bytes = n,
        width = 64 + (n % 512),
        height = 64 + ((n * 7) % 512),
        format = (docId % 3) match {
          case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
        },
        n_frames = 1 + (n % 30))
    }
  }

  /** Documents table → binary payload column (stand-in for real media
    * bytes; the pipeline shape is payload-source-agnostic). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-batched decode: one pass, decoder state amortized per
    * partition, output is a typed Dataset with a columnar-friendly
    * schema. This is the `mapInPandas` shape expressed in Scala. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs).as[(Long, Array[Byte])].mapPartitions { it =>
      // per-partition decoder setup would go here (codec init, GPU pin...)
      it.map { case (id, payload) => FakeDecoder.decode(id, payload) }
    }
  }

  /** Frame sampling: every `every`-th frame of each decoded payload,
    * with its byte offset — the explode stage a video-curation
    * pipeline feeds to per-frame feature extraction. Pure expressions
    * over the decoded metadata (`sequence` + `explode`), so the frame
    * index set and offsets are oracle-reproducible. */
  def sampleFrames(spark: SparkSession, docs: DataFrame, every: Int): DataFrame = {
    decodeMeta(spark, docs).toDF()
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        // explicit floor: Spark's double->bigint cast truncates while
        // DuckDB's rounds, so the oracle uses FLOOR on both sides
        floor(col("frame_idx").cast("bigint") * col("n_bytes") / col("n_frames"))
          .as("byte_offset"))
  }

  /** One resized media row: original + fitted dimensions, output size. */
  case class Resized(doc_id: Long, width: Long, height: Long,
                     out_w: Long, out_h: Long, out_bytes: Long)

  /** Resize stage stub: fit each decoded payload into a `box`×`box`
    * square preserving aspect ratio (integer floor arithmetic, so the
    * dimensions are oracle-reproducible). A real implementation would
    * transform pixels in the same mapPartitions pass — the Spark-side
    * shape (typed partition pass, columnar output, no driver collect)
    * is the real thing; only the pixel work is stubbed. */
  def resize(spark: SparkSession, docs: DataFrame, box: Int = 224): Dataset[Resized] = {
    import spark.implicits._
    decodeMeta(spark, docs).map { m =>
      val (w, h) = (m.width.toLong, m.height.toLong)
      val (ow, oh) =
        if (w >= h) (box.toLong, math.max(1L, h * box / w))
        else (math.max(1L, w * box / h), box.toLong)
      Resized(m.doc_id, w, h, ow, oh, ow * oh * 3)
    }
  }

  /** Feature extraction stub: a deterministic pseudo-embedding from
    * payload bytes (a real pipeline would run an image/audio encoder
    * here — same mapPartitions batch shape, same output schema
    * `array<float>`, directly consumable by [[VectorOps]]). */
  def extractFeatures(spark: SparkSession, docs: DataFrame,
                      dim: Int = 16): DataFrame = {
    import spark.implicits._
    withPayload(docs).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, payload) =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < payload.length) {
          v(i % dim) += (payload(i) & 0xFF) / 255.0f
          i += 1
        }
        (id, v.toSeq)
      }
    }.toDF("doc_id", "feature")
  }

  /** Metadata extraction + aggregate by format — the downstream query
    * a curation pipeline runs over decoded metadata. */
  def metaSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    decodeMeta(spark, docs).toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        min(col("height")).as("min_height"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("format"))
  }
}
