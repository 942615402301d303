package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.extra.Multimodal
import graft.model.Tables

/** Multimodal / semi-structured column queries (north-star X6 + the
  * binary-column pipeline): JSON props extraction and the binary media
  * plumbing (deterministic stub codec, real Spark dataflow).
  */
object MultimodalQueriesImpl {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ---- props_extract ------------------------------------------------

  /** JSON path extraction from the semi-structured props column. */
  def propsExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_value"))
      .orderBy("event_id")

  private val propsExtractOracle =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---- props_stats --------------------------------------------------

  /** Aggregate over an extracted JSON field: mod-10 bucket stats. */
  def propsStats(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("k_mod",
        pmod(get_json_object(col("props"), "$.k").cast("long"), lit(10L)))
      .groupBy("k_mod")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 2))).cast("double") /
          count(col("value")), 6).as("avg_value"))
      .orderBy("k_mod")

  private val propsStatsOracle =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |        / count(value), 6) AS avg_value
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---- multimodal_meta ---------------------------------------------

  /** Binary media pipeline: documents → binary payloads → iterator-based
    * partition decode (stub codec) → typed metadata.
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractMeta(Multimodal.assetsFromDocuments(docs(s, dir)))
      .toDF()
      .orderBy("media_id")

  private val multimodalMetaOracle =
    """SELECT doc_id AS media_id,
      |  (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(1 + ascii(substr(text, 1, 1)) % 64 AS INTEGER) AS width,
      |  CAST(1 + ascii(substr(text, 2, 1)) % 64 AS INTEGER) AS height,
      |  CAST(1 + octet_length(encode(text)) % 30 AS INTEGER) AS n_frames
      |FROM documents
      |ORDER BY media_id""".stripMargin

  // ---- multimodal_frames -------------------------------------------

  /** Frame sampling over "video" assets: every 4th frame, max 8. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.extractMeta(Multimodal.assetsFromDocuments(docs(s, dir))),
      step = 4, maxFrames = 8)
      .orderBy("media_id", "frame_idx")

  private val multimodalFramesOracle =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
      |    CAST(1 + octet_length(encode(text)) % 30 AS INTEGER) AS n_frames
      |  FROM documents)
      |SELECT media_id, n_frames,
      |  CAST(unnest((range(0, n_frames, 4))[1:8]) AS INTEGER) AS frame_idx
      |FROM m
      |WHERE kind = 'video'
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---- multimodal_resize -------------------------------------------

  /** Aspect-preserving resize plan (bounding box 256) over the media
    * metadata — pure integer-exact metadata math.
    */
  def multimodalResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.withResizePlan(
      Multimodal.extractMeta(Multimodal.assetsFromDocuments(docs(s, dir))),
      maxSide = 256)
      .select("media_id", "width", "height", "resized_w", "resized_h")
      .orderBy("media_id")

  private val multimodalResizeOracle =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CAST(1 + ascii(substr(text, 1, 1)) % 64 AS INTEGER) AS width,
      |    CAST(1 + ascii(substr(text, 2, 1)) % 64 AS INTEGER) AS height
      |  FROM documents)
      |SELECT media_id, width, height,
      |  CAST(greatest(1, floor(width * 256 / greatest(width, height)))
      |    AS INTEGER) AS resized_w,
      |  CAST(greatest(1, floor(height * 256 / greatest(width, height)))
      |    AS INTEGER) AS resized_h
      |FROM m
      |ORDER BY media_id""".stripMargin

  // ---- multimodal_decode -------------------------------------------

  /** REAL image codec round trip (javax.imageio, JDK-builtin): render a
    * deterministic PNG per doc_id in the executors, decode it back in
    * the same partition pass, output the DECODED dimensions. The oracle
    * knows only the dimension formulas — it never sees the PNG bytes —
    * so a hash match proves the real encode → decode path is faithful
    * for every row. (PNG byte size is codec-version-dependent and
    * deliberately excluded.)
    */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.pngRoundTrip(docs(s, dir), "doc_id")
      .toDF()
      .select("media_id", "kind", "width", "height", "n_frames")
      .orderBy("media_id")

  private val multimodalDecodeOracle =
    """SELECT doc_id AS media_id, 'image' AS kind,
      |  CAST(1 + doc_id % 37 AS INTEGER) AS width,
      |  CAST(1 + (doc_id * 7) % 29 AS INTEGER) AS height,
      |  CAST(1 AS INTEGER) AS n_frames
      |FROM documents
      |ORDER BY media_id""".stripMargin

  // ---- audio_decode ------------------------------------------------

  /** REAL audio codec round trip (javax.sound.sampled, JDK-builtin):
    * synthesize a deterministic PCM16 WAV per doc_id in the executors,
    * decode it back in the same partition pass, output the DECODED
    * sample-rate/channels/frame-count and the duration derived from
    * them. The oracle knows only the per-id parameter formulas — it
    * never sees the WAV bytes — so a hash match proves the real
    * encode → decode path is faithful for every row. (WAV byte size is
    * container-chunk-dependent and deliberately excluded, as with PNG.)
    */
  def audioDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.wavRoundTrip(docs(s, dir), "doc_id")
      .toDF()
      .select(col("media_id"), col("sample_rate"), col("channels"),
        col("n_frames"), round(col("duration_ms"), 6).as("duration_ms"))
      .orderBy("media_id")

  private val audioDecodeOracle =
    """SELECT doc_id AS media_id,
      |  CAST(([8000,16000,44100])[CAST(doc_id % 3 AS INTEGER) + 1]
      |    AS INTEGER) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
      |  CAST(50 + (doc_id * 13) % 250 AS BIGINT) AS n_frames,
      |  round((50 + (doc_id * 13) % 250) * 1000.0
      |    / (([8000,16000,44100])[CAST(doc_id % 3 AS INTEGER) + 1]), 6)
      |    AS duration_ms
      |FROM documents
      |ORDER BY media_id""".stripMargin

  // ---- multimodal_features -----------------------------------------

  /** Stub feature extraction: 8-dim payload-derived vectors through the
    * typed mapPartitions path; compared elementwise via explode (array
    * columns hash poorly across engines, floats compare exactly here —
    * byte/255 is representable).
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.assetsFromDocuments(docs(s, dir)))
      .toDF()
      .select(col("media_id"),
        posexplode(col("features")).as(Seq("dim", "feature")))
      .select(col("media_id"), col("dim"),
        round(col("feature").cast("double"), 6).as("feature"))
      .orderBy("media_id", "dim")

  private val multimodalFeaturesOracle =
    """SELECT doc_id AS media_id, CAST(i AS INTEGER) AS dim,
      |  round(CAST(CAST(CASE WHEN length(text) > i
      |    THEN ascii(substr(text, CAST(i + 1 AS INTEGER), 1)) ELSE 0 END
      |    AS FLOAT) / CAST(255 AS FLOAT) AS DOUBLE), 6) AS feature
      |FROM documents CROSS JOIN range(0, 8) t(i)
      |ORDER BY media_id, dim""".stripMargin

  // ---- image_neardup -----------------------------------------------

  /** IMAGE NEAR-DUP detection end to end on the REAL codec: per doc_id,
    * render a deterministic PNG (ids 2k/2k+1 share seed k, the odd id
    * perturbed by one white pixel — a planted near-dup pair per k),
    * decode it back with javax.imageio, compute the 56-bit integer-exact
    * difference hash from the DECODED pixels, then find near-dup pairs
    * with banded LSH over the hash bits + exact Hamming verify
    * ([[graft.extra.Dedup.hashNearDup]]). The oracle reproduces every
    * hash bit from the pixel FORMULAS alone (it never sees a PNG), so a
    * hash match proves decode faithfulness pixel-by-pixel AND the
    * banding/verify pipeline — the full image-dedup path a training-data
    * pipeline runs, minus only the exotic codecs this env lacks.
    */
  def imageNearDupQ(s: SparkSession, dir: String): DataFrame =
    graft.extra.Dedup.hashNearDup(
        Multimodal.renderDHash(docs(s, dir), "doc_id").toDF(),
        "media_id", "dhash", bands = 4, bandBits = 14, maxHamming = 8)
      .orderBy("id_a", "id_b")

  private val imageNearDupOracle =
    """WITH ids AS (SELECT doc_id AS id, doc_id // 2 AS pair FROM documents),
      |dims AS (SELECT id, pair,
      |    CAST(8 + pair % 30 AS BIGINT) AS w,
      |    CAST(8 + (pair * 7) % 24 AS BIGINT) AS h
      |  FROM ids),
      |px AS (SELECT id, w, h, gx.x AS x, gy.y AS y,
      |    CASE WHEN id % 2 = 1 AND gx.x = 0 AND gy.y = 0 THEN 255
      |      ELSE (((pair * 2654435761 + gx.x * 131 + gy.y * 31) % 16777216)
      |              // 65536
      |        + (((pair * 2654435761 + gx.x * 131 + gy.y * 31) % 16777216)
      |              // 256) % 256
      |        + ((pair * 2654435761 + gx.x * 131 + gy.y * 31) % 16777216)
      |              % 256) // 3
      |      END AS gray
      |  FROM dims
      |  CROSS JOIN range(0, 37) gx(x)
      |  CROSS JOIN range(0, 31) gy(y)
      |  WHERE gx.x < w AND gy.y < h),
      |cells AS (SELECT id, (x * 8) // w AS cx, (y * 8) // h AS cy,
      |    sum(gray) // count(*) AS a
      |  FROM px GROUP BY 1, 2, 3),
      |hashes AS (SELECT l.id,
      |    CAST(sum(CASE WHEN l.a > r.a
      |      THEN 1::BIGINT << CAST(l.cy * 7 + l.cx AS INTEGER)
      |      ELSE 0 END) AS BIGINT) AS h
      |  FROM cells l JOIN cells r
      |    ON l.id = r.id AND l.cy = r.cy AND r.cx = l.cx + 1
      |  GROUP BY 1),
      |banded AS (SELECT id, h, k.k AS k,
      |    (h >> CAST(k.k * 14 AS INTEGER)) & 16383 AS band
      |  FROM hashes CROSS JOIN range(0, 4) k(k)),
      |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
      |    a.h AS h_a, b.h AS h_b
      |  FROM banded a JOIN banded b
      |    ON a.k = b.k AND a.band = b.band AND a.id < b.id)
      |SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INTEGER)
      |    AS hamming
      |FROM cand WHERE bit_count(xor(h_a, h_b)) <= 8
      |ORDER BY id_a, id_b""".stripMargin

  // ---- audio_neardup -----------------------------------------------

  /** AUDIO NEAR-DUP detection end to end on the REAL codec — the audio
    * mirror of [[imageNearDupQ]]: per doc_id, synthesize a deterministic
    * mono PCM16 clip (ids 2k/2k+1 share seed k, the odd id perturbed by
    * one max-amplitude sample), WAV-encode and decode it back with
    * javax.sound.sampled, fingerprint the DECODED samples with the
    * 56-bit integer-exact energy contour, then pair near-dups with the
    * same banded-LSH + Hamming verify. The oracle replays the mod-2⁶⁴
    * sample generator in HUGEINT arithmetic and rebuilds every hash bit
    * from the formulas alone — a green row proves the codec reads back
    * every PCM sample faithfully.
    */
  def audioNearDupQ(s: SparkSession, dir: String): DataFrame =
    graft.extra.Dedup.hashNearDup(
        Multimodal.renderAudioHash(docs(s, dir), "doc_id").toDF(),
        "media_id", "ahash", bands = 4, bandBits = 14, maxHamming = 8)
      .orderBy("id_a", "id_b")

  private val audioNearDupOracle =
    """WITH ids AS (SELECT doc_id AS id, doc_id // 2 AS pair FROM documents),
      |par AS (SELECT id, pair,
      |    CAST(60 + (pair * 13) % 200 AS BIGINT) AS n FROM ids),
      |raw AS (SELECT id, n, i.i AS i,
      |    CAST(((pair::HUGEINT * 6364136223846793005 +
      |           i.i::HUGEINT * 1442695040888963407 +
      |           pair::HUGEINT * i.i * 2862933555777941757)
      |          % 18446744073709551616::HUGEINT)
      |         // 281474976710656 AS BIGINT) AS x
      |  FROM par CROSS JOIN range(0, 260) i(i) WHERE i.i < n),
      |samp AS (SELECT id, n, i,
      |    CASE WHEN id % 2 = 1 AND i = 0 THEN 32767
      |         WHEN x >= 32768 THEN x - 65536 ELSE x END AS s
      |  FROM raw),
      |en AS (SELECT id, (i * 57) // n AS w,
      |    sum(abs(s)) // count(*) AS e
      |  FROM samp GROUP BY 1, 2),
      |hashes AS (SELECT l.id, CAST(sum(CASE WHEN l.e > r.e
      |      THEN 1::BIGINT << CAST(l.w AS INTEGER) ELSE 0 END) AS BIGINT)
      |    AS h
      |  FROM en l JOIN en r ON l.id = r.id AND r.w = l.w + 1
      |  GROUP BY 1),
      |banded AS (SELECT id, h, k.k AS k,
      |    (h >> CAST(k.k * 14 AS INTEGER)) & 16383 AS band
      |  FROM hashes CROSS JOIN range(0, 4) k(k)),
      |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
      |    a.h AS h_a, b.h AS h_b
      |  FROM banded a JOIN banded b
      |    ON a.k = b.k AND a.band = b.band AND a.id < b.id)
      |SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INTEGER)
      |    AS hamming
      |FROM cand WHERE bit_count(xor(h_a, h_b)) <= 8
      |ORDER BY id_a, id_b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("multimodal_resize",
      "aspect-preserving resize plan (metadata math)",
      multimodalResize, Some(multimodalResizeOracle)),
    QueryDef("multimodal_features",
      "stub 8-dim payload feature vectors via typed mapPartitions",
      multimodalFeatures, Some(multimodalFeaturesOracle)),
    QueryDef("props_extract",
      "JSON path extraction (get_json_object) from props",
      propsExtract, Some(propsExtractOracle)),
    QueryDef("props_stats",
      "grouped stats over an extracted JSON field",
      propsStats, Some(propsStatsOracle)),
    QueryDef("multimodal_meta",
      "binary media envelope + iterator-partition decode (real imageio for images, stub otherwise)",
      multimodalMeta, Some(multimodalMetaOracle)),
    QueryDef("multimodal_decode",
      "REAL javax.imageio PNG render+decode round trip in executors",
      multimodalDecode, Some(multimodalDecodeOracle)),
    QueryDef("audio_decode",
      "REAL javax.sound.sampled WAV encode+decode round trip in executors",
      audioDecode, Some(audioDecodeOracle)),
    QueryDef("multimodal_frames",
      "frame sampling explode over video assets",
      multimodalFrames, Some(multimodalFramesOracle)),
    QueryDef("image_neardup",
      "REAL-codec image near-dup: decoded-pixel dHash + banded LSH pairs",
      imageNearDupQ, Some(imageNearDupOracle)),
    QueryDef("audio_neardup",
      "REAL-codec audio near-dup: decoded-sample energy hash + LSH pairs",
      audioNearDupQ, Some(audioNearDupOracle)))
}
