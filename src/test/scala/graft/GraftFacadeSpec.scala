package graft

import org.apache.spark.sql.functions._

/** The public facade delegates correctly (smoke over real testdata). */
class GraftFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("facade: end-to-end tick flow (generate -> json -> parse -> features)") {
    val ticks = Graft.syntheticTicks(spark, 500)
    val payloads = graft.ops.TickParse.toJsonPayload(ticks)
    val parsed = Graft.parseTicks(payloads)
    val feats = Graft.features(parsed,
      Graft.featureConfig(window = "60s", slide = "10s"))
    assert(feats.count() > 0)
    assert(feats.columns.contains("log_return"))
  }

  test("facade: dedup + similarity + text over test tables") {
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val embs = graft.model.Tables.load(spark, sfDir, "embeddings")
    assert(Graft.nearDupMinhash(docs, "doc_id", "text").count() > 0)
    assert(Graft.textQuality(docs, "text").count() == docs.count())
    val topk = Graft.similarTopK(embs, "vec_id", "embedding",
      col("id") < 3, 2)
    assert(topk.count() == 6)
    assert(Graft.dot(lit(Array(1.0f, 2.0f)), lit(Array(3.0f, 4.0f))) != null)
  }

  test("facade: round-3 surface (curation, clusters, ivf/kmeans, layout)") {
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val embs = graft.model.Tables.load(spark, sfDir, "embeddings")
    val verdicts = Graft.curate(docs, "doc_id", "text")
    assert(verdicts.count() == docs.count())
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    assert(Graft.dupClusters(pairs).count() == 3)
    assert(Graft.similarTopKIvf(embs, "vec_id", "embedding",
      col("id") < 2, 3).count() > 0)
    assert(Graft.kmeansCodebook(embs, "vec_id", "embedding",
      k = 4, iters = 1).size == 4)
    assert(Graft.nearDupEmbedding(embs, "vec_id", "embedding", 0.4)
      .columns.toSeq == Seq("vec_a", "vec_b", "cosine"))
    val dir = java.nio.file.Files.createTempDirectory("facade_lay").toString
    Graft.writeClustered(spark.range(100).toDF("id"), dir,
      Seq(col("id")), numFiles = 2)
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("facade: round-8 surface (mixing, budget cut, decontamination, " +
      "PQ searches, packing)") {
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val embs = graft.model.Tables.load(spark, sfDir, "embeddings")
    val mixed = Graft.mixDomains(docs, "doc_id", "source",
      Map("src0" -> 2.0), defaultRate = 1.0)
    assert(mixed.count() > docs.count())
    assert(Graft.weightedSample(docs, "doc_id", lit(1.0)).count()
      == docs.count())
    val benchmark = docs.filter(col("doc_id") < 3).select("text")
    val decon = Graft.decontaminate(docs, benchmark, "doc_id", "text",
      "text")
    assert(decon.filter(col("contaminated")).count() >= 3)
    val (ranked, n) = Graft.globalRowNumber(docs.select("doc_id"),
      Seq(col("doc_id")), "pos")
    assert(n == docs.count() && ranked.count() == n)
    val summed = Graft.globalPrefixSum(docs.select("doc_id"),
      Seq(col("doc_id")), lit(1L), "cum")
    assert(summed.agg(org.apache.spark.sql.functions.max("cum"))
      .head.getLong(0) == docs.count())
    val granked = Graft.groupedRowNumber(docs.select("doc_id", "source"),
      Seq("source"), Seq(col("doc_id")), "rk", totalOut = Some("n"))
    assert(granked.filter(col("rk") > col("n")).count() == 0 &&
      granked.count() == docs.count())
    val gsummed = Graft.groupedPrefixSum(docs.select("doc_id", "source"),
      Seq("source"), Seq(col("doc_id")), lit(1L), "cum")
    assert(gsummed.agg(org.apache.spark.sql.functions.max("cum"))
      .head.getLong(0) == granked.agg(
        org.apache.spark.sql.functions.max("n")).head.getLong(0))
    assert(Graft.similarTopKPq(embs, "vec_id", "embedding",
      col("id") < 2, 3).count() == 6)
    assert(Graft.similarTopKIvfPq(embs, "vec_id", "embedding",
      col("id") < 2, 3).count() > 0)
    val packed = Graft.packSequences(docs, "doc_id", lit(100L), 512L)
    assert(packed.count() == docs.count())
  }

  test("facade: round-8 curation surface (semdedup, unigram score, " +
      "vocab coverage, chunking)") {
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val embs = graft.model.Tables.load(spark, sfDir, "embeddings")
    val kept = Graft.semDedup(embs, "vec_id", "embedding",
      threshold = 0.4, numClusters = 16)
    assert(kept.count() > 0 && kept.count() <= embs.count())
    val scored = Graft.unigramScore(docs, "doc_id", "text")
    assert(scored.count() == docs.count())
    val cov = Graft.vocabCoverage(docs, "doc_id", "text", topK = 16)
    assert(cov.filter(col("vocab_coverage") > 1.0).count() == 0)
    val chunks = Graft.chunkTokens(docs, "doc_id", "text", 32)
    assert(chunks.count() >= docs.count())
  }

  test("facade: analytics + retrieval + graph surface (vwap, drawdown, " +
      "correlation, gap fill, fences, bm25, pagerank)") {
    val ev = graft.model.Tables.load(spark, sfDir, "events")
      .withColumn("qty", (col("event_id") % 10 + 1).cast("long"))
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    assert(Graft.vwap(ev, "event_type", "ts", "value", "qty").count() > 0)
    assert(Graft.maxDrawdown(ev, "event_type", "ts", "value").count() > 0)
    assert(Graft.pairCorrelation(ev, "event_type", "ts", "value")
      .count() > 0)
    val filled = Graft.gapFill(ev, "event_type", "ts", "value", "event_id")
    assert(filled.count() >= ev.select("event_type").distinct().count())
    assert(Graft.anomalyMad(ev, "event_type", "value").count() ==
      ev.select("event_type").distinct().count())
    assert(Graft.bollinger(ev, "event_type", "ts", "value").count() > 0)
    assert(Graft.bm25(docs, "doc_id", "text", Seq("spark"), topK = 5)
      .count() <= 5)
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    assert(Graft.pagerank(edges, "src", "dst", iters = 2).count() == 2)
  }

  test("facade: round-9 surface (trained PQ codebook, persisted ANN " +
      "index + append, RRF fusion, bigram LM)") {
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val embs = graft.model.Tables.load(spark, sfDir, "embeddings")
    val cb = Graft.kmeansPqCodebook(embs, "vec_id", "embedding",
      m = 8, numCentroids = 4, iters = 1)
    assert(cb.size == 4 && cb.head.v.length == 64)
    val dir = java.nio.file.Files.createTempDirectory("facade_ann").toString
    val idx = Graft.buildAndWriteAnnIndex(embs.filter(col("vec_id") < 400),
      "vec_id", "embedding", dir, numCentroids = 8, pqCentroids = 8).get
    assert(idx.coded.count() == 400)
    Graft.appendAnnIndex(spark, dir,
      embs.filter(col("vec_id") >= 400), "vec_id", "embedding")
    assert(Graft.readAnnIndex(spark, dir).coded.count() == embs.count())
    val arm = Seq(("q", 1L, 1), ("q", 2L, 2)).toDF("qid", "doc_id", "rank")
    assert(Graft.rrfFuse(arm, arm, "qid", "doc_id").count() == 2)
    assert(Graft.bigramScore(docs, "doc_id", "text").count() > 0)
  }

  test("facade: round-10 surface (persisted BM25 index, indexed " +
      "multi-query search)") {
    import spark.implicits._
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("facade_bm25").toString
    Graft.buildBm25Index(docs, "doc_id", "text", dir)
    val queries = Seq(("q1", "spark shuffle join")).toDF("qid", "qtext")
    val hits = Graft.bm25SearchIndexed(spark, dir, queries, "qid", "qtext",
      idCol = "doc_id", topK = 5)
    assert(hits.count() == 5)
    assert(hits.columns.contains("score"))
  }

  test("facade: graph census + DSIR + fingerprint near-dup surface") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val tri = Graft.triangles(edges, "src", "dst").collect().head
    assert(tri.getAs[Long]("n_triangles") == 1L)
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val w = Graft.dsirWeights(docs, "doc_id", "text",
      col("source") === "src0")
    assert(w.columns.toSeq == Seq("doc_id", "n_tokens", "log_weight"))
    assert(w.count() == docs.count())
    val hashes = Seq((1L, 5L), (2L, 5L)).toDF("id", "h")
    assert(Graft.hashNearDup(hashes, "id", "h").count() == 1)
  }

  test("facade: BFS + connected components surface") {
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val dists = Graft.bfs(edges, "src", "dst", lit("a"), maxDepth = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dists == Map("a" -> 0, "b" -> 1, "c" -> 2))
    val comps = Graft.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comps == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("facade: CEP + Count-Min + skyline surface") {
    val ev = Seq((1L, 1000L, 0L, "a"), (1L, 2000L, 1L, "b"),
      (1L, 3000L, 2L, "c"))
      .toDF("k", "ms", "id", "typ")
      .select(col("k"), timestamp_millis(col("ms")).as("ts"),
        col("id"), col("typ"))
    assert(Graft.matchContiguous(ev, "k", "ts", "typ",
      Seq("a", "b", "c"), 10000L, "id").count() == 1)
    assert(Graft.matchSkipTillNext(ev, "k", "ts", "typ",
      Seq("a", "c"), 10000L, "id").collect().head.n_skipped == 1)
    val keys = Seq(1L, 1L, 2L).toDF("k")
    val est = Graft.countMinEstimate(Graft.countMinCells(keys, "k"),
        keys.distinct(), "k")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est")).toMap
    assert(est(1L) == 2L && est(2L) == 1L)
    val pts = Seq((1L, 1.0, 5), (2L, 2.0, 4)).toDF("id", "cost", "gain")
    // id=2 costs more and gains less: dominated
    assert(Graft.skyline2d(pts, "cost", "gain").select("id").as[Long]
      .collect().toSeq == Seq(1L))
  }

  test("facade: statistics + quality + multi-query retrieval surface") {
    val ev = graft.model.Tables.load(spark, sfDir, "events")
      .withColumn("variant", (col("user_id") % 2).cast("int"))
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    assert(Graft.welchTTest(ev, "event_type", "variant", "value")
      .count() > 0)
    assert(Graft.olsTrend(ev, "event_type", "ts", "value").count() > 0)
    assert(Graft.autocorrelation(ev, "event_type", "ts", "value")
      .count() > 0)
    assert(Graft.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).count() == 2)
    assert(Graft.cohortRetention(ev, "user_id", "ts").count() > 0)
    assert(Graft.categoryEntropy(ev, "user_id", "event_type")
      .count() > 0)
    assert(Graft.histogram(ev, "event_type", "value").count() > 0)
    assert(Graft.exactQuantiles(ev, "event_type", "value", Seq(0.5))
      .count() > 0)
    assert(Graft.anomalyMadApprox(ev, "event_type", "value").count() > 0)
    val diff = Graft.snapshotDiff(docs, docs.filter(col("doc_id") % 2 === 0),
      "doc_id", Seq("text"))
    assert(diff.filter(col("status") === "removed").count() > 0)
    val report = Graft.dataQualityReport(Seq(
      graft.extra.Quality.duplicateKeys(docs, Seq("doc_id"), "dup_docs")))
    assert(report.collect().head.getLong(1) == 0L)
    val queries = Seq(("q", "spark")).toDF("qid", "qtext")
    assert(Graft.bm25All(docs, "doc_id", "text", queries, "qid", "qtext",
      topK = 3).count() <= 3)
    val zdir = java.nio.file.Files.createTempDirectory("fz").toString
    Graft.writeZOrdered(ev.select("user_id", "value")
      .withColumn("user_id", col("user_id").cast("double")),
      zdir, Seq("user_id", "value"), numFiles = 4)
    assert(spark.read.parquet(zdir).count() == ev.count())
  }

  test("facade: corpus-maintenance surface (merge upsert/versioned/" +
      "delete, index deletes)") {
    val tdir = java.nio.file.Files.createTempDirectory("fmerge").toString
    val base = spark.range(100).select(col("id"),
      lit(1L).as("ver"), concat(lit("d"), col("id")).as("text"))
    graft.extra.Layout.writeClustered(base, tdir, Seq(col("id")), 4)
    assert(Graft.mergeUpsert(spark, tdir,
      Seq((5L, 2L, "up")).toDF("id", "ver", "text"), "id")
      .rowsWritten > 0)
    assert(Graft.mergeUpsertVersioned(spark, tdir,
      Seq((5L, 1L, "stale")).toDF("id", "ver", "text"), "id", "ver")
      .filesTotal > 0)
    assert(spark.read.parquet(tdir).filter(col("id") === 5L)
      .head().getString(2) == "up") // version guard held
    Graft.mergeDelete(spark, tdir, Seq(7L).toDF("id"), "id")
    assert(spark.read.parquet(tdir).filter(col("id") === 7L).isEmpty)

    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val bdir = java.nio.file.Files.createTempDirectory("fbm").toString
    Graft.buildBm25Index(docs, "doc_id", "text", bdir)
    assert(Graft.deleteFromBm25Index(spark, bdir,
      Seq(1L).toDF("doc_id"), "doc_id") == 1L)
    val adir = java.nio.file.Files.createTempDirectory("fann").toString
    val emb = graft.model.Tables.load(spark, sfDir, "embeddings")
    Graft.buildAndWriteAnnIndex(emb, "vec_id", "embedding", adir,
      numCentroids = 8, m = 8, pqCentroids = 8)
    Graft.deleteFromAnnIndex(spark, adir, Seq(1L).toDF("vec_id"),
      "vec_id")
    assert(new java.io.File(s"$adir/tombstones").exists())
  }

  test("facade: snapshot-table + incremental-view + join/sketch " +
      "surface (init/upsert/diff/lookup/compact/vacuum, view " +
      "init/refresh/serve, bloom join, heavy hitters)") {
    val sdir = java.nio.file.Files.createTempDirectory("fsnap").toString
    Graft.snapshotInit(spark.range(50)
      .select(col("id"), lit("a").as("t")), sdir, "id", 2)
    Graft.snapshotUpsert(spark, sdir,
      Seq((1L, "b")).toDF("id", "t"), "id")
    assert(Graft.snapshotRead(spark, sdir, Some(0L))
      .filter(col("id") === 1L).head().getString(1) == "a")
    assert(Graft.snapshotDiff(spark, sdir, 0L, 1L, "id").count() == 1)
    assert(Graft.snapshotLookup(spark, sdir,
      Seq(1L).toDF("id"), "id").head().getString(1) == "b")
    Graft.snapshotDelete(spark, sdir, Seq(2L).toDF("id"), "id")
    Graft.snapshotCompact(spark, sdir, "id")
    Graft.snapshotVacuum(spark, sdir, retainFrom = 3L)
    assert(Graft.snapshotRead(spark, sdir).count() == 49)
    // range read on the cluster key rides the manifest stats
    assert(Graft.snapshotReadRange(spark, sdir, "id", 10L, 19L)
      .count() == 10)

    val rdir = java.nio.file.Files.createTempDirectory("frange").toString
    Graft.snapshotInit(spark.range(100)
      .select(col("id"), (col("id") * 2).as("ts2")), rdir, "id", 4,
      statsCols = Seq("ts2"))
    val rr = Graft.snapshotReadRange(spark, rdir, "ts2", 0L, 48L)
    assert(rr.count() == 25)
    assert(rr.inputFiles.length == 1)
    // versioned CDC apply with the exactly-once txn token
    Graft.snapshotUpsertVersioned(spark, rdir,
      Seq((1L, 999L)).toDF("id", "ts2"), "id", "ts2",
      txn = Some(("facade", 1L)))
    assert(graft.extra.Snapshots.lastTxn(spark, rdir, "facade")
      .contains(1L))
    // append-only rollback: head reverts to v0's content, the undone
    // version still travels
    val rc = Graft.snapshotRestore(spark, rdir, 0L)
    assert(rc.rowsWritten == 0L)
    assert(Graft.snapshotRead(spark, rdir)
      .filter(col("id") === 1L).head().getLong(1) == 2L)
    assert(Graft.snapshotRead(spark, rdir, Some(rc.version - 1))
      .filter(col("id") === 1L).head().getLong(1) == 999L)

    val vdir = java.nio.file.Files.createTempDirectory("fview").toString
    val spec = graft.extra.IncrementalAgg.ViewSpec("g",
      sumCols = Seq("amt"))
    def rows(r: Range) = r.map(i => (i.toLong % 4, BigDecimal(i)))
      .toDF("g", "amt")
      .select(col("g"), col("amt").cast("decimal(18,2)").as("amt"))
    Graft.viewInit(rows(0 until 40), spec, vdir, 2)
    Graft.viewRefresh(spark, vdir, rows(40 until 60), spec)
    val served = Graft.viewServe(spark, vdir, spec)
    assert(served.count() == 4)
    assert(served.agg(sum("cnt")).head().getLong(0) == 60L)

    val big = spark.range(5000).select(col("id"), (col("id") % 97).as("k"))
    val dim = spark.range(5).select((col("id") * 10).as("k"))
    assert(Graft.bloomJoin(big, Seq("k"), dim, Seq("k")).count() ==
      big.join(dim, big("k") === dim("k")).count())

    val items = (0 until 500).map(i =>
      if (i % 2 == 0) "hot" else s"t$i").toDF("item")
    val hh = Graft.heavyHitters(items, "item", 0.1)
      .as[(String, Long)].collect()
    assert(hh.toSeq == Seq(("hot", 250L)))
  }

  test("facade: persisted-dedup-index + vocabulary-BPE surface (r16)") {
    def tmp(p: String) = {
      val d = java.nio.file.Files.createTempDirectory(p)
      d.toFile.deleteOnExit(); d.toString
    }
    val corpus = Seq((0L, "shared run alpha beta gamma delta epsilon"),
      (1L, "unrelated corpus words entirely distinct here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "shared run alpha beta gamma delta epsilon"),
      (101L, "fresh novel batch document nothing indexed"))
      .toDF("doc_id", "text")
    // MinHash band index round trip + takedown
    val mdir = tmp("fmh")
    Graft.buildMinhashIndex(corpus, "doc_id", "text", mdir)
    val mv = Graft.minhashIndexDedupBatch(spark, mdir, batch,
      "doc_id", "text")
      .filter(col("is_dup")).select("doc_id", "dup_of").collect()
    assert(mv.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((100L, 0L)))
    assert(Graft.deleteFromMinhashIndex(spark, mdir,
      Seq(Tuple1(0L)).toDF("d")) == 1L)
    assert(Graft.minhashIndexDedupBatch(spark, mdir, batch,
      "doc_id", "text").filter(col("is_dup")).count() == 0L)
    // semantic index round trip + takedown
    val sdir = tmp("fsem")
    val emb = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
      .toDF("doc_id", "embedding")
    Graft.buildSemanticIndex(emb, "doc_id", "embedding", sdir,
      numClusters = 4)
    val sb = Seq((100L, Seq(0.99f, 0.01f, 0f, 0f)))
      .toDF("doc_id", "embedding")
    assert(Graft.semanticIndexDedupBatch(spark, sdir, sb,
      "doc_id", "embedding", 0.95).filter(col("is_dup")).count() == 1L)
    assert(Graft.deleteFromSemanticIndex(spark, sdir,
      Seq(Tuple1(0L)).toDF("d")) == 1L)
    assert(Graft.semanticIndexDedupBatch(spark, sdir, sb,
      "doc_id", "embedding", 0.95).filter(col("is_dup")).count() == 0L)
    // substr index span dedup
    val xdir = tmp("fsub")
    Graft.buildSubstrIndex(corpus, "doc_id", "text", xdir)
    val xv = Graft.substrIndexDedupBatch(spark, xdir, batch,
      "doc_id", "text").select("doc_id", "n_tokens_removed")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(xv.head._1 == 100L && xv.head._2 > 0L)
    assert(xv(1) == ((101L, 0L)))
    // BPE auto tier: expression (small list) and typed (padded past
    // the ceiling) agree
    val merges = graft.extra.Text.trainBpe(corpus, "text", 8)
    val small = Graft.bpeTokenCounts(corpus, "text", merges)
      .select("doc_id", "n_bpe_tokens").orderBy("doc_id").collect()
      .map(_.getLong(1)).toSeq
    val padded = merges ++ (0 until graft.extra.Text.BpeExprMaxMerges)
      .map(i => (s"__p$i", s"__q$i"))
    val big = Graft.bpeTokenCounts(corpus, "text", padded)
      .select("doc_id", "n_bpe_tokens").orderBy("doc_id").collect()
      .map(_.getLong(1)).toSeq
    assert(small == big && small.forall(_ > 0L))
  }
}
