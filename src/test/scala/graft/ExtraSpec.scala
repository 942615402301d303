package graft

import org.apache.spark.sql.functions._

import graft.extra.{Multimodal, Similarity, TimeSeries}

/** Hand-computed expectations for similarity / time-series / multimodal. */
class ExtraSpec extends SparkSpec {
  import spark.implicits._

  test("topKBruteForce ranks by cosine with deterministic ties") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),   // query
      (1L, Array(1.0f, 0.0f)),   // cos 1
      (2L, Array(1.0f, 1.0f)),   // cos ~0.707
      (3L, Array(0.0f, 1.0f)))   // cos 0
      .toDF("vec_id", "embedding")
    val out = Similarity.topKBruteForce(df, "vec_id", "embedding",
      col("id") === 0, k = 2).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(out.head.getDouble(3) == 1.0)
  }

  test("graft_dot registers as a SQL function and matches the Column API") {
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(viaSql == 11.0)
    val viaCol = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(graft.functions.GraftFunctions.dot_product(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(viaCol == 11.0)
  }

  test("graft_dot: null elements poison the result (HOF-fold parity)") {
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) AS d")
      .collect().head
    assert(viaSql.isNullAt(0))
  }

  test("int8 quantization: codes bounded, untruncated re-rank equals " +
      "brute force, default recall holds on the test embeddings") {
    val emb = graft.model.Tables.load(spark, sfDir, "embeddings")
    // codes bounded to [-127, 127]
    val q = Similarity.quantizeInt8(
      Similarity.prepare(emb, "vec_id", "embedding"))
    val outOfRange = q.select(explode(col("qv")).as("c"))
      .filter(abs(col("c")) > 127).count()
    assert(outOfRange == 0)
    // with candidates not truncated, the exact re-rank IS brute force
    val brute = Similarity.topKBruteForce(emb, "vec_id", "embedding",
        col("id") < 10, k = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq).toSet
    // candFactor at the guard ceiling: k*candFactor = 100k, far beyond
    // the test corpus, so the re-rank is effectively untruncated
    val untrunc = Similarity.topKInt8(emb, "vec_id", "embedding",
        col("id") < 10, k = 5, candFactor = 20000)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq).toSet
    assert(untrunc == brute)
    // default candFactor=3: top-5 recall vs brute force stays high
    val got = Similarity.topKInt8(emb, "vec_id", "embedding",
        col("id") < 10, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brute.map(s => (s(0).asInstanceOf[Long], s(2).asInstanceOf[Long]))
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.8, s"int8 top-5 recall $recall")
    // guard: a "shortlist" approaching a corpus scan is IVF/LSH's job
    intercept[IllegalArgumentException] {
      Similarity.topKInt8(emb, "vec_id", "embedding",
        col("id") < 10, k = 5, candFactor = 1000000)
    }
    intercept[IllegalArgumentException] {
      Similarity.topKInt8(emb, "vec_id", "embedding",
        col("id") < 10, k = 0)
    }
  }

  test("PQ: untruncated re-rank equals brute force; guards reject " +
      "bad subspace/k combinations") {
    val emb = graft.model.Tables.load(spark, sfDir, "embeddings")
    val brute = Similarity.topKBruteForce(emb, "vec_id", "embedding",
        col("id") < 10, k = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq).toSet
    // candidate set un-truncated => the exact re-rank IS brute force,
    // regardless of how lossy the 8x16 codebook is
    val untrunc = Similarity.topKPq(emb, "vec_id", "embedding",
        col("id") < 10, k = 5, candFactor = 20000)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq).toSet
    assert(untrunc == brute)
    // codes land in [0, numCentroids)
    intercept[IllegalArgumentException] {
      Similarity.topKPq(emb, "vec_id", "embedding",
        col("id") < 10, k = 5, m = 7) // 64 % 7 != 0
    }
    intercept[IllegalArgumentException] {
      Similarity.topKPq(emb, "vec_id", "embedding",
        col("id") < 10, k = 0)
    }
  }

  test("IVF-PQ: probing every list with an untruncated re-rank " +
      "degenerates to brute force") {
    val emb = graft.model.Tables.load(spark, sfDir, "embeddings")
    val brute = Similarity.topKBruteForce(emb, "vec_id", "embedding",
        col("id") < 10, k = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq).toSet
    val full = Similarity.topKIvfPq(emb, "vec_id", "embedding",
        col("id") < 10, k = 5, numCentroids = 32, nprobe = 32,
        candFactor = 20000)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq).toSet
    assert(full == brute)
  }

  test("multi-table LSH recall beats single-table on the test embeddings") {
    val embs = graft.model.Tables.load(spark, sfDir, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.topKBruteForce(
      embs, "vec_id", "embedding", col("id") < 10, 5))
    val multi = pairs(Similarity.topKLshMulti(
      embs, "vec_id", "embedding", col("id") < 10, 5))
    val single = pairs(Similarity.topKLsh(
      embs, "vec_id", "embedding", col("id") < 10, 5))
    val ivf = pairs(Similarity.topKIvf(
      embs, "vec_id", "embedding", col("id") < 10, 5))
    val recallMulti = (exact & multi).size.toDouble / exact.size
    val recallSingle = (exact & single).size.toDouble / exact.size
    val recallIvf = (exact & ivf).size.toDouble / exact.size
    assert(recallMulti >= 0.2, s"multi-table recall $recallMulti")
    assert(recallIvf >= 0.2, s"ivf recall $recallIvf")
    assert(recallMulti > recallSingle,
      s"multi ($recallMulti) must beat single ($recallSingle)")
  }

  test("asofJoin carries the latest prior right row, ties count as prior") {
    val left = Seq((1L, "2024-01-01 10:00:00", 100L))
      .toDF("k", "ts", "lid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (1L, "2024-01-01 09:00:00", 1.0),
      (1L, "2024-01-01 10:00:00", 2.0),   // same-instant: counts
      (1L, "2024-01-01 11:00:00", 3.0))   // after: must not leak
      .toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = TimeSeries.asofJoin(left, right, "k", "ts", Seq("v")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("asof_v") == 2.0)
  }

  test("asofJoin yields null when no prior right row exists") {
    val left = Seq((1L, "2024-01-01 08:00:00", 100L))
      .toDF("k", "ts", "lid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq((1L, "2024-01-01 09:00:00", 1.0))
      .toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = TimeSeries.asofJoin(left, right, "k", "ts", Seq("v")).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("asof_v")))
  }

  test("sessionize splits on gap and numbers sessions per key") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00"),
      (1L, "2024-01-01 00:10:00"),   // same session (10 min)
      (1L, "2024-01-02 00:30:00"),   // new session (>24h? no, 24.33h yes)
      (2L, "2024-01-01 00:00:00"))
      .toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = TimeSeries.sessionStats(df, "user_id", "ts", 86400L)
      .orderBy("user_id", "session_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("ohlc computes open/high/low/close by event time") {
    val df = Seq(
      ("A", "2024-01-01 00:01:00", 10.0),
      ("A", "2024-01-01 00:02:00", 30.0),
      ("A", "2024-01-01 00:03:00", 5.0),
      ("A", "2024-01-01 00:04:00", 20.0))
      .toDF("sym", "ts", "px")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = TimeSeries.ohlc(df, "sym", "ts", "px", "1 day").collect().head
    assert(r.getDouble(2) == 10.0)  // open
    assert(r.getDouble(3) == 30.0)  // high
    assert(r.getDouble(4) == 5.0)   // low
    assert(r.getDouble(5) == 20.0)  // close
    assert(r.getLong(6) == 4L)
  }

  test("multimodal pipeline: stub decode is deterministic and typed") {
    val docs = Seq((5L, "hello world media payload")).toDF("doc_id", "text")
    val meta = Multimodal.extractMeta(Multimodal.assetsFromDocuments(docs))
      .collect().head
    assert(meta.media_id == 5L)
    assert(meta.kind == "video")   // 5 % 3 == 2 -> video
    assert(meta.n_bytes == 25L)
    assert(meta.width == 1 + 'h'.toInt % 64)
    assert(meta.height == 1 + 'e'.toInt % 64)
    assert(meta.n_frames == 1 + 25 % 30)
  }

  test("real image decode: ImageIO round-trips a known PNG and " +
      "extractMeta reports its true dimensions") {
    // direct codec round trip on a hand-sized image
    val png = Multimodal.ImageCodec.encodePng(5, 3, seed = 42L)
    assert(png.length > 8)
    // PNG magic bytes prove a real encoder ran
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte)
    assert(Multimodal.ImageCodec.decodeDims(png).contains((5, 3)))
    // corrupt payloads decode to None, never throw
    assert(Multimodal.ImageCodec.decodeDims("not an image".getBytes).isEmpty)
    assert(Multimodal.ImageCodec.decodeDims(Array.empty[Byte]).isEmpty)

    // through the distributed path: an image-kind asset carrying a real
    // PNG reports decoded dims and n_frames = 1, not the stub's fake
    val assets = Seq(Multimodal.MediaAsset(3L, "image",
      Multimodal.ImageCodec.encodePng(17, 11, seed = 3L))).toDS()
    val meta = Multimodal.extractMeta(assets).collect().head
    assert(meta.width == 17 && meta.height == 11 && meta.n_frames == 1)

    // pngRoundTrip: formula dims survive executor-side encode+decode
    val rt = Multimodal.pngRoundTrip(
      Seq(0L, 1L, 40L, 123L).toDF("doc_id"), "doc_id")
      .collect().map(m => m.media_id -> (m.width, m.height)).toMap
    for (id <- Seq(0L, 1L, 40L, 123L))
      assert(rt(id) == (1 + (id % 37).toInt, 1 + ((id * 7) % 29).toInt))
  }

  test("real audio decode: AudioSystem round-trips a known WAV and " +
      "wavRoundTrip reports true decoded properties") {
    // direct codec round trip on a hand-sized clip
    val wav = Multimodal.AudioCodec.encodeWav(
      sampleRate = 8000, channels = 2, nFrames = 123, seed = 7L)
    // RIFF/WAVE magic bytes prove a real encoder ran
    assert(wav.length > 44) // header + 123 frames * 4 bytes
    assert(wav(0) == 'R'.toByte && wav(1) == 'I'.toByte &&
      wav(2) == 'F'.toByte && wav(3) == 'F'.toByte)
    assert(wav(8) == 'W'.toByte && wav(9) == 'A'.toByte &&
      wav(10) == 'V'.toByte && wav(11) == 'E'.toByte)
    assert(Multimodal.AudioCodec.decodeProps(wav).contains((8000, 2, 123L)))
    // corrupt payloads decode to None, never throw
    assert(Multimodal.AudioCodec.decodeProps("not audio".getBytes).isEmpty)
    assert(Multimodal.AudioCodec.decodeProps(Array.empty[Byte]).isEmpty)

    // through the distributed path: decoded properties match the per-id
    // formulas (rate by id%3, channels by id%2, frames by (id*13)%250)
    val ids = Seq(0L, 1L, 5L, 122L)
    val rt = Multimodal.wavRoundTrip(ids.toDF("doc_id"), "doc_id")
      .collect().map(m => m.media_id -> m).toMap
    for (id <- ids) {
      val m = rt(id)
      assert(m.sample_rate == Array(8000, 16000, 44100)((id % 3).toInt))
      assert(m.channels == 1 + (id % 2).toInt)
      assert(m.n_frames == 50 + ((id * 13) % 250))
      assert(m.duration_ms == m.n_frames * 1000.0 / m.sample_rate)
    }
  }

  test("resize plan preserves aspect ratio inside the bounding box") {
    // 'h'=104 -> width 1+104%64=41 ; 'e'=101 -> height 1+101%64=38
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val r = Multimodal.withResizePlan(
      Multimodal.extractMeta(Multimodal.assetsFromDocuments(docs)), 256)
      .select("width", "height", "resized_w", "resized_h").collect().head
    assert(r.getInt(0) == 41 && r.getInt(1) == 38)
    assert(r.getInt(2) == 256)                  // long side hits the box
    assert(r.getInt(3) == 38 * 256 / 41)        // short side scales
  }

  test("frame sampling: every step-th frame, capped") {
    val docs = Seq((2L, "x" * 100)).toDF("doc_id", "text")  // video, 101 frames->21
    val meta = Multimodal.extractMeta(Multimodal.assetsFromDocuments(docs))
    val frames = Multimodal.sampleFrames(meta, step = 4, maxFrames = 8)
      .select("frame_idx").as[Int].collect().sorted
    assert(frames.length <= 8)
    assert(frames.forall(_ % 4 == 0))
  }

  // ---- image perceptual hash + banded near-dup ----------------------

  test("dHash56: deterministic, 56-bit bounded; the one-pixel planted " +
      "perturbation flips at most 1 bit; different seeds differ widely") {
    val base = Multimodal.ImageCodec.renderRgb(20, 16, seed = 7L)
    val h1 = Multimodal.dHash56(base)
    assert(h1 == Multimodal.dHash56(
      Multimodal.ImageCodec.renderRgb(20, 16, seed = 7L)))
    assert(h1 >= 0L && h1 < (1L << 56))
    val pert = Multimodal.ImageCodec.renderRgb(20, 16, seed = 7L)
    pert.setRGB(0, 0, 0xffffff)
    assert(java.lang.Long.bitCount(h1 ^ Multimodal.dHash56(pert)) <= 1)
    val other = Multimodal.dHash56(
      Multimodal.ImageCodec.renderRgb(20, 16, seed = 1234567L))
    assert(java.lang.Long.bitCount(h1 ^ other) > 8)
  }

  test("dHash56 survives the PNG encode/decode round trip (lossless RGB)") {
    val img = Multimodal.ImageCodec.renderRgb(33, 29, seed = 99L)
    val dec = Multimodal.ImageCodec.decodeImage(
      Multimodal.ImageCodec.encodePng(img)).get
    assert(Multimodal.dHash56(img) == Multimodal.dHash56(dec))
  }

  test("hashNearDup: pigeonhole guarantee — pairs within bands-1 bits " +
      "always surface; bits spread across every band can be missed") {
    import graft.extra.Dedup
    val h0 = 0x00FF00FF00FFL
    val near = h0 ^ 7L                // 3 differing bits, all in band 0
    val spread = h0 ^ (1L | (1L << 14) | (1L << 28) | (1L << 42)) // 1 per band
    val hashes = Seq((1L, h0), (2L, near), (3L, spread))
      .toDF("id", "h")
    val out = Dedup.hashNearDup(hashes, "id", "h",
        bands = 4, bandBits = 14, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L))) // <= bands-1 diffs: guaranteed
    assert(!out.contains((1L, 3L))) // 4 diffs, one per band: every band differs
    // hamming value is exact on the surfaced pair
    val ham = Dedup.hashNearDup(hashes, "id", "h", 4, 14, 8)
      .where($"id_a" === 1L && $"id_b" === 2L)
      .select("hamming").as[Int].collect().head
    assert(ham == 3)
  }

  test("hashNearDup: maxHamming filters verified pairs; identical " +
      "hashes pair at distance 0") {
    import graft.extra.Dedup
    val hashes = Seq((1L, 5L), (2L, 5L), (3L, 5L ^ 0x3FFL))
      .toDF("id", "h")
    val out = Dedup.hashNearDup(hashes, "id", "h", 4, 14, 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out((1L, 2L)) == 0)
    assert(!out.contains((1L, 3L))) // hamming 10 > 4, same band 1..3 though
  }

  test("audioHash56: deterministic 56-bit contour; one-sample planted " +
      "perturbation flips at most 1 bit; WAV round trip preserves it") {
    val samples = Array.tabulate(123)(i => Multimodal.AudioCodec.fpSampleAt(9L, i))
    val h1 = Multimodal.audioHash56(samples)
    assert(h1 >= 0L && h1 < (1L << 56))
    val pert = samples.clone(); pert(0) = 32767
    assert(java.lang.Long.bitCount(h1 ^ Multimodal.audioHash56(pert)) <= 1)
    // encode → REAL decode → identical samples → identical hash
    val wav = Multimodal.AudioCodec.encodeWavSamples(8000, 1, samples)
    val dec = Multimodal.AudioCodec.decodeSamples(wav).get
    assert(dec.toSeq == samples.toSeq)
    assert(Multimodal.audioHash56(dec) == h1)
    val other = Multimodal.audioHash56(
      Array.tabulate(123)(i => Multimodal.AudioCodec.fpSampleAt(987654L, i)))
    assert(java.lang.Long.bitCount(h1 ^ other) > 8)
  }

  test("renderAudioHash plants near-dup pairs (2k, 2k+1) and is " +
      "invariant to partitioning") {
    val ids = (0L until 20L).toDF("doc_id")
    val rows = Multimodal.renderAudioHash(ids, "doc_id").collect()
      .map(r => r.media_id -> r.ahash).toMap
    (0L until 10L).foreach { k =>
      assert(java.lang.Long.bitCount(rows(2 * k) ^ rows(2 * k + 1)) <= 1,
        s"pair $k")
    }
    val again = Multimodal.renderAudioHash(ids.repartition(7), "doc_id")
      .collect().map(r => r.media_id -> r.ahash).toMap
    assert(again == rows)
  }

  test("renderDHash plants near-dup pairs (2k, 2k+1) and is invariant " +
      "to partitioning") {
    val ids = (0L until 20L).toDF("doc_id")
    val rows = Multimodal.renderDHash(ids, "doc_id").collect()
      .map(r => r.media_id -> r.dhash).toMap
    (0L until 10L).foreach { k =>
      assert(java.lang.Long.bitCount(rows(2 * k) ^ rows(2 * k + 1)) <= 1,
        s"pair $k")
    }
    val again = Multimodal.renderDHash(ids.repartition(7), "doc_id")
      .collect().map(r => r.media_id -> r.dhash).toMap
    assert(again == rows)
  }
}
