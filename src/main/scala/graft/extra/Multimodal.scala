package graft.extra

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by iterator-based partition
  * transforms (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB ([[FakeCodec]]) —
  * what is real and tested is everything Spark-side: the binary schema,
  * the typed `Dataset` plumbing, iterator-per-partition processing (no
  * per-row JVM call overhead, no driver collect), and the explode shape
  * for frame sampling.
  *
  * Scale notes: binary payloads ride the normal columnar path (parquet
  * binary + offsets). Partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes`; metadata extraction is a pure
  * map (no shuffle); frame sampling multiplies rows by ≤ maxFrames
  * before any shuffle, so downstream aggs see bounded fan-out.
  */
object Multimodal {

  /** A media asset: opaque payload + minimal typed envelope. */
  final case class MediaAsset(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted per-asset metadata (what a real decoder would return). */
  final case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)

  /** STUB decoder. A real implementation would call an image/audio/video
    * library here (per partition, reusing a decoder instance across the
    * iterator). This fake derives dimensions deterministically from the
    * payload header bytes so tests and oracles can check the plumbing.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      // ??? — real codec goes here; deterministic fake below.
      val b0 = if (payload.length > 0) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      val width = 1 + b0 % 64
      val height = 1 + b1 % 64
      val frames = 1 + (payload.length % 30)
      (width, height, frames)
    }
  }

  /** Binary envelope from the documents table: text bytes stand in for a
    * media payload (the container has no real media); kind is assigned
    * round-robin by id so all three modalities exercise the same path.
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  /** Iterator-per-partition metadata extraction — the mapInPandas-shaped
    * hot path: one decoder per partition, streaming over rows.
    */
  def extractMeta(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { a =>
        val (w, h, f) = FakeCodec.decode(a.payload)
        MediaMeta(a.media_id, a.kind, a.payload.length.toLong, w, h, f)
      }
    }
  }

  /** Frame sampling for video assets: every `step`-th frame index, capped
    * at `maxFrames` — the explode shape a real frame extractor would use.
    */
  def sampleFrames(meta: Dataset[MediaMeta], step: Int, maxFrames: Int): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), col("n_frames") - 1, lit(step)),
          1, maxFrames)))
      .select("media_id", "n_frames", "frame_idx")

  /** Resize plan: target dims preserving aspect ratio within a bounding
    * box — pure metadata math (a real implementation would also
    * transcode the payload in the same partition pass). Integer-exact:
    * scale = min over dims of maxSide/dim computed in rational form.
    */
  def withResizePlan(meta: Dataset[MediaMeta], maxSide: Int): DataFrame = {
    val df = meta.toDF()
    // out = max(1, dim * maxSide / maxDim) with integer truncation,
    // identical in any engine
    val maxDim = greatest(col("width"), col("height"))
    df.withColumn("resized_w",
        greatest(lit(1), floor(col("width") * maxSide / maxDim)).cast("int"))
      .withColumn("resized_h",
        greatest(lit(1), floor(col("height") * maxSide / maxDim)).cast("int"))
  }

  /** Feature extraction STUB over the payload: an 8-dim float vector
    * from the first 8 payload bytes (normalized to [0,1]) — the real
    * version would run an encoder per partition; the Spark shape
    * (iterator pass, fixed-width Array[Float] column, no driver hops)
    * is what is being exercised and tested.
    */
  final case class MediaFeatures(media_id: Long, kind: String,
      features: Array[Float])

  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition encoder init would go here
      it.map { a =>
        val f = (0 until 8).map { i =>
          val b = if (a.payload.length > i) a.payload(i) & 0xff else 0
          b / 255.0f
        }.toArray
        MediaFeatures(a.media_id, a.kind, f)
      }
    }
  }
}
