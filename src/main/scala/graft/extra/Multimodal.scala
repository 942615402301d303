package graft.extra

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by iterator-based partition
  * transforms (the Scala analog of `mapInPandas` batch UDFs).
  *
  * IMAGE decode is REAL: `javax.imageio` ships with the JDK, so
  * [[ImageCodec]] decodes PNG/JPEG/BMP/GIF payloads to true dimensions
  * (and renders deterministic PNGs for round-trip tests/queries).
  * AUDIO decode is REAL for WAV/PCM: `javax.sound.sampled.AudioSystem`
  * is likewise JDK-builtin, so [[AudioCodec]] reads true
  * sample-rate/channels/frame-count (and writes deterministic PCM16
  * WAVs for round trips). Only VIDEO and compressed-audio codecs are
  * absent from this environment, so those decodes remain a
  * clearly-marked deterministic STUB
  * ([[FakeCodec]]) — everything Spark-side is real either way: the
  * binary schema, the typed `Dataset` plumbing, iterator-per-partition
  * processing (no per-row JVM call overhead, no driver collect), and
  * the explode shape for frame sampling.
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

  /** REAL image codec on the JDK-builtin `javax.imageio` — no external
    * jars. Decode inspects the payload's magic bytes; non-image payloads
    * (or the audio/video kinds) return None and fall back to the stub.
    */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executors

    /** The decoded image itself, if the payload is decodable. */
    def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

    /** True (width, height) if the payload is a decodable image. */
    def decodeDims(payload: Array[Byte]): Option[(Int, Int)] =
      decodeImage(payload).map(img => (img.getWidth, img.getHeight))

    /** Deterministic `width`×`height` RGB raster: pixel (x, y) carries
      * the low 24 bits of `seed·2654435761 + 131x + 31y` — the formula
      * the SQL oracles replay, so decoded PIXEL VALUES (not just
      * dimensions) are independently checkable.
      */
    def renderRgb(width: Int, height: Int,
        seed: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y,
            ((seed * 2654435761L + x * 131 + y * 31).toInt) & 0xffffff)
          x += 1
        }
        y += 1
      }
      img
    }

    /** PNG-encode an image (lossless RGB — decode returns the exact
      * pixel values, which the perceptual-hash path depends on).
      */
    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Render a `width`×`height` PNG with seed-determined pixels —
      * byte-deterministic for a fixed JDK, used for round-trip tests and
      * the executor-side render → decode query path.
      */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] =
      encodePng(renderRgb(width, height, seed))
  }

  /** REAL audio codec on the JDK-builtin `javax.sound.sampled` — no
    * external jars, same argument as [[ImageCodec]]. Handles the WAV/PCM
    * container; compressed formats (mp3/aac/…) have no JDK service
    * provider and fall through to the stub.
    */
  object AudioCodec {

    /** True (sample_rate, channels, n_frames) if the payload is
      * JDK-decodable audio (WAV/PCM, AIFF, AU).
      */
    def decodeProps(payload: Array[Byte]): Option[(Int, Int, Long)] = {
      var in: javax.sound.sampled.AudioInputStream = null
      try {
        in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val f = in.getFormat
        Some((f.getSampleRate.toInt, f.getChannels, in.getFrameLength))
      } catch {
        case _: Exception => None
      } finally if (in != null) in.close()
    }

    /** The deterministic PCG-style sample stream `encodeWav` writes:
      * sample i = top 16 bits of the mod-2⁶⁴ product — the formula the
      * SQL oracles replay (HUGEINT arithmetic reproduces the wrap).
      */
    def sampleAt(seed: Long, i: Int): Short =
      ((seed * 6364136223846793005L + i * 1442695040888963407L) >>> 48).toShort

    /** Fingerprint-path sample stream: like [[sampleAt]] plus a
      * `seed·i` CROSS TERM. Without it, two seeds' streams differ by a
      * constant 64-bit offset at every index, so their energy contours
      * (and fingerprints) correlate heavily — measured Hamming ≈ 6/56
      * between unrelated clips vs ≈ 30/56 with the cross term. All
      * terms stay products of bounded ints, so the SQL oracle replays
      * the mod-2⁶⁴ wrap exactly in HUGEINT.
      */
    def fpSampleAt(seed: Long, i: Int): Short =
      ((seed * 6364136223846793005L + i * 1442695040888963407L +
        seed * i * 2862933555777941757L) >>> 48).toShort

    /** PCM16-LE-encode explicit samples (interleaved if channels > 1)
      * through the real `AudioSystem.write` WAVE encoder.
      */
    def encodeWavSamples(sampleRate: Int, channels: Int,
        samples: Array[Short]): Array[Byte] = {
      require(samples.length % channels == 0, "partial frame")
      val pcm = new Array[Byte](2 * samples.length)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, channels, true, false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt,
        (samples.length / channels).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Synthesize an `nFrames`-frame signed-PCM16 little-endian WAV with
      * seed-determined samples ([[sampleAt]]), written through the real
      * `AudioSystem.write` WAVE encoder — byte-deterministic for a fixed
      * JDK, used for round-trip tests and the executor-side
      * encode → decode query path.
      */
    def encodeWav(sampleRate: Int, channels: Int, nFrames: Int,
        seed: Long): Array[Byte] =
      encodeWavSamples(sampleRate, channels,
        Array.tabulate(nFrames * channels)(i => sampleAt(seed, i)))

    /** The decoded PCM16 samples themselves (interleaved), if the
      * payload is JDK-decodable 16-bit audio — the pixel-value analog
      * for the fingerprinting path.
      */
    def decodeSamples(payload: Array[Byte]): Option[Array[Short]] = {
      var in: javax.sound.sampled.AudioInputStream = null
      try {
        in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16) return None
        val bytes = in.readAllBytes()
        val out = new Array[Short](bytes.length / 2)
        val le = !f.isBigEndian
        var i = 0
        while (i < out.length) {
          out(i) =
            if (le) (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
            else (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
          i += 1
        }
        Some(out)
      } catch {
        case _: Exception => None
      } finally if (in != null) in.close()
    }
  }

  /** STUB decoder for the modalities whose libraries do NOT exist in
    * this environment (video and compressed audio; also the fallback
    * for image/audio-kind payloads that are not decodable by the real
    * JDK codecs). A real implementation would invoke the media library
    * at the top of this method (per partition, reusing a decoder
    * instance across the iterator); this fake derives dimensions
    * deterministically from the payload header bytes so tests and
    * oracles can check the plumbing.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
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
    * hot path: one decoder per partition, streaming over rows. Image
    * payloads get the REAL `javax.imageio` decode (true dimensions,
    * n_frames = 1 for stills); undecodable payloads and the stub
    * modalities fall back to [[FakeCodec]].
    */
  def extractMeta(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { a =>
        val real =
          if (a.kind == "image") ImageCodec.decodeDims(a.payload) else None
        real match {
          case Some((w, h)) =>
            MediaMeta(a.media_id, a.kind, a.payload.length.toLong, w, h, 1)
          case None =>
            val (w, h, f) = FakeCodec.decode(a.payload)
            MediaMeta(a.media_id, a.kind, a.payload.length.toLong, w, h, f)
        }
      }
    }
  }

  /** Executor-side PNG render → decode round trip: one deterministic
    * image per input id (dims derived from the id by the caller-visible
    * formulas below), encoded and decoded back with the REAL codec in
    * the same partition pass — no driver hop, no shuffle. The decoded
    * dimensions are the query output, so an oracle that knows only the
    * formulas independently checks that the real encode/decode is
    * faithful.
    */
  def pngRoundTrip(ids: DataFrame, idCol: String): Dataset[MediaMeta] = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids, idCol).mapPartitions { it =>
      it.map { id =>
        val w = 1 + (id % 37).toInt
        val h = 1 + ((id * 7) % 29).toInt
        val png = ImageCodec.encodePng(w, h, seed = id)
        val (dw, dh) = ImageCodec.decodeDims(png).getOrElse((-1, -1))
        MediaMeta(id, "image", png.length.toLong, dw, dh, 1)
      }
    }
  }

  /** Per-image perceptual hash row: true decoded dims + 56-bit dHash. */
  final case class ImageHash(media_id: Long, width: Int, height: Int,
      dhash: Long)

  /** 56-bit DIFFERENCE HASH (dHash) of a decoded image — the standard
    * perceptual fingerprint for image near-dup detection: average the
    * grayscale into an 8×8 cell grid, then emit one bit per
    * horizontally adjacent cell pair (left brighter → 1), 7 bits × 8
    * rows. Near-identical images (small edits, re-encodes) differ in
    * few bits; unrelated images differ in ~half of them — Hamming
    * distance on the hash is the similarity metric.
    *
    * INTEGER-EXACT by construction: gray = (r+g+b) div 3, cell value =
    * sum(gray) div count, cell index = (x·8) div w — no floats, so the
    * hash is a pure function of the pixel values, reproducible by any
    * engine (the SQL oracle replays it) and stable across partitioning.
    * 56 bits (not 64) keeps the hash in a non-negative BIGINT for
    * engine-portable shifts/masks. Requires w, h ≥ 8 (every cell
    * non-empty).
    */
  def dHash56(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 8 && h >= 8, s"dHash56 needs w,h >= 8, got ${w}x$h")
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) & 0xffffff
        val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        val c = cy * 8 + x * 8 / w
        sums(c) += gray
        cnts(c) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 7) {
        if (sums(cy * 8 + cx) / cnts(cy * 8 + cx) >
            sums(cy * 8 + cx + 1) / cnts(cy * 8 + cx + 1))
          hash |= 1L << (cy * 7 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  /** The codec round-trip builders are CPU-bound per row (encode +
    * real-codec decode), but their input is a bare id list that
    * arrives at the scan's partitioning — one task for a single-file
    * id table, which serialized the whole render/decode pass (r16,
    * guide §2.5 input skew / §8 "shuffle keys, not payloads"): spread
    * the 8-byte id rows across the session's parallelism before the
    * typed pass. Hash-by-id: deterministic (no round-robin sort), and
    * the output is partitioning-independent by construction.
    * IMAGE builders only: `javax.sound.sampled`'s provider lookup is
    * globally synchronized, so the WAV round trips measured 3.5×
    * SLOWER under 32-way parallelism — the audio builders keep the
    * scan's partitioning (single-thread codec, no lock convoy).
    */
  private def spreadIds(ids: DataFrame, idCol: String)
      : Dataset[Long] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long"))
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .as[Long]
  }

  /** Executor-side render → perturb → PNG encode → REAL decode → dHash,
    * one partition pass per id (no driver hop, no shuffle): ids 2k and
    * 2k+1 render the SAME seed-k image, with the odd id's pixel (0,0)
    * overwritten white before encoding — a planted near-dup pair per k
    * (one changed pixel moves only cell (0,0)'s average, which feeds a
    * single adjacent-cell comparison, so the pair differs in ≤ 1 hash
    * bit). The hash is computed from the DECODED pixels, so the
    * pipeline exercises the real codec end to end, and the SQL oracle —
    * which knows only the pixel formulas, never the PNG bytes —
    * independently reproduces every hash bit.
    */
  def renderDHash(ids: DataFrame, idCol: String): Dataset[ImageHash] = {
    val spark = ids.sparkSession
    import spark.implicits._
    spreadIds(ids, idCol).mapPartitions { it =>
      it.map { id =>
        val pair = id / 2
        val w = 8 + (pair % 30).toInt
        val h = 8 + ((pair * 7) % 24).toInt
        val img = ImageCodec.renderRgb(w, h, seed = pair)
        if (id % 2 == 1) img.setRGB(0, 0, 0xffffff)
        val png = ImageCodec.encodePng(img)
        val dec = ImageCodec.decodeImage(png).getOrElse(
          throw new IllegalStateException(s"PNG round trip failed for id $id"))
        ImageHash(id, dec.getWidth, dec.getHeight, dHash56(dec))
      }
    }
  }

  /** Per-clip fingerprint row: decoded frame count + 56-bit hash. */
  final case class AudioHash(media_id: Long, n_frames: Int, ahash: Long)

  /** 56-bit ENERGY-CONTOUR fingerprint of decoded PCM samples — the
    * audio analog of [[dHash56]] (chromaprint-style shape, integer
    * arithmetic): map each sample index to one of 57 consecutive
    * windows (`window = i·57 div n` — the same floor partition the SQL
    * oracle replays), window energy = mean |sample| (integer division),
    * one bit per adjacent-window comparison. Clips that differ by a few
    * samples keep their contour (small Hamming distance); unrelated
    * clips differ in ~half the bits. Requires ≥ 57 samples.
    */
  def audioHash56(samples: Array[Short]): Long = {
    val n = samples.length
    require(n >= 57, s"audioHash56 needs >= 57 samples, got $n")
    val sums = new Array[Long](57)
    val cnts = new Array[Long](57)
    var i = 0
    while (i < n) {
      val w = (i.toLong * 57 / n).toInt
      sums(w) += math.abs(samples(i).toInt)
      cnts(w) += 1
      i += 1
    }
    var hash = 0L
    var j = 0
    while (j < 56) {
      if (sums(j) / cnts(j) > sums(j + 1) / cnts(j + 1)) hash |= 1L << j
      j += 1
    }
    hash
  }

  /** Executor-side synthesize → perturb → WAV encode → REAL decode →
    * fingerprint, one partition pass per id (the audio mirror of
    * [[renderDHash]]): ids 2k and 2k+1 carry the SAME seed-k mono PCM
    * stream, with the odd id's sample 0 overwritten to max amplitude
    * before encoding — a planted near-dup pair per k (one sample moves
    * only window 0's energy, one adjacent comparison, ≤ 1 hash bit).
    * The fingerprint is computed from the DECODED samples, so the green
    * oracle row proves `javax.sound.sampled` reads back every PCM
    * sample faithfully — the formula-only oracle replays the mod-2⁶⁴
    * sample generator in HUGEINT.
    */
  def renderAudioHash(ids: DataFrame, idCol: String): Dataset[AudioHash] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val pair = id / 2
        val nFrames = 60 + ((pair * 13) % 200).toInt
        val samples = Array.tabulate(nFrames)(i => AudioCodec.fpSampleAt(pair, i))
        if (id % 2 == 1) samples(0) = 32767
        val wav = AudioCodec.encodeWavSamples(8000, 1, samples)
        val dec = AudioCodec.decodeSamples(wav).getOrElse(
          throw new IllegalStateException(s"WAV round trip failed for id $id"))
        AudioHash(id, dec.length, audioHash56(dec))
      }
    }
  }

  /** Decoded audio metadata (true properties from the real codec).
    * `duration_ms` is derived from the DECODED frame count and rate —
    * `round(n_frames * 1000.0 / sample_rate, 6)`, IEEE-double exact and
    * reproducible by any engine from the same two integers.
    */
  final case class AudioMeta(
      media_id: Long, sample_rate: Int, channels: Int, n_frames: Long,
      duration_ms: Double)

  /** Executor-side WAV encode → decode round trip, the audio mirror of
    * [[pngRoundTrip]]: one deterministic PCM16 WAV per input id (rate /
    * channels / frame-count derived from the id by the caller-visible
    * formulas below), written and read back with the REAL
    * `javax.sound.sampled` codec in the same partition pass — no driver
    * hop, no shuffle. The decoded properties are the query output, so an
    * oracle that knows only the formulas independently checks that the
    * real encode/decode is faithful. (Payload byte size is
    * container-chunk-dependent across JDKs and deliberately excluded,
    * as with PNG.)
    */
  def wavRoundTrip(ids: DataFrame, idCol: String): Dataset[AudioMeta] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rate = Array(8000, 16000, 44100)((id % 3).toInt)
        val channels = 1 + (id % 2).toInt
        val frames = 50 + ((id * 13) % 250).toInt
        val wav = AudioCodec.encodeWav(rate, channels, frames, seed = id)
        val (dRate, dCh, dFrames) =
          AudioCodec.decodeProps(wav).getOrElse((-1, -1, -1L))
        // raw IEEE division here; callers round(…, 6) in-plan so both
        // engines round identically (proven oracle-determinism rule)
        AudioMeta(id, dRate, dCh, dFrames, dFrames * 1000.0 / dRate)
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
