package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

import graft.model.Tick
import graft.ops.Features.FeatureConfig

/** graft — the public facade.
  *
  * A Spark-native analytics engine with the capabilities of the
  * realtime-market-data-pipeline reference plus large-scale
  * training-data operators. One import gives the whole surface:
  *
  * {{{
  * import graft.Graft
  *
  * // batch: sliding-window tick features (the reference's flagship)
  * val feats = Graft.features(ticksDf, Graft.featureConfig(
  *   window = "60 seconds", slide = "10 seconds"))
  *
  * // streaming: same core, update-mode, distributed parquet sink
  * val q = Graft.startStream(spark, source, cfg)
  *
  * // training-data ops
  * val dups   = Graft.nearDupMinhash(docs, "doc_id", "text")
  * val topk   = Graft.similarTopK(embs, "vec_id", "embedding", $"id" < 10, 5)
  * val scored = Graft.textQuality(docs, "text")
  * }}}
  */
object Graft {

  // ---- ingestion ----------------------------------------------------

  /** JSON wire payloads → typed ticks with event_time (reference
    * parse_kafka parity, plus an explicit malformed-record policy).
    */
  def parseTicks(raw: DataFrame, dropMalformed: Boolean = true): DataFrame =
    ops.TickParse.parseRaw(raw, dropMalformed = dropMalformed)

  def readBackfillCsv(spark: SparkSession, path: String): DataFrame =
    ops.TickParse.readBackfillCsv(spark, path)

  def syntheticTicks(spark: SparkSession, n: Long,
      cfg: gen.TickGen.GbmConfig = gen.TickGen.GbmConfig()): DataFrame =
    gen.TickGen.gbm(spark, n, cfg)

  // ---- flagship features --------------------------------------------

  def featureConfig(window: String = "60 seconds",
      slide: String = "10 seconds",
      keyCol: String = "symbol", valueCol: String = "price",
      timeCol: String = "event_time"): FeatureConfig =
    FeatureConfig(util.Durations.normalize(window),
      Some(util.Durations.normalize(slide)), None, keyCol, valueCol, timeCol)

  /** Sliding/tumbling per-key windowed features (first/last price, log
    * return, volatility proxy, tick counts) — deterministic variant.
    */
  def features(df: DataFrame, cfg: FeatureConfig): DataFrame =
    ops.Features.compute(df, cfg)

  def trueVolatility(df: DataFrame, cfg: FeatureConfig): DataFrame =
    ops.Features.computeTrueVolatility(df, cfg)

  // ---- streaming ----------------------------------------------------

  def startStream(spark: SparkSession, source: streaming.TickSource,
      cfg: streaming.StreamingPipeline.Config)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streaming.StreamingPipeline.start(spark, source, cfg)

  /** Collapse an update-mode append sink to final rows per window. */
  def finalizeStream(spark: SparkSession, outDir: String): DataFrame =
    streaming.StreamingPipeline.finalized(spark, outDir)

  def emaPerSymbol(ticks: Dataset[Tick], alpha: Double) =
    streaming.Stateful.emaPerSymbol(ticks, alpha)

  /** Streaming as-of: trades enriched with the last-seen quote per key
    * (O(1) state per key; low-latency path — see Stateful.asofPerKey).
    */
  def asofStream(events: Dataset[streaming.Stateful.AsOfEvent]) =
    streaming.Stateful.asofPerKey(events)

  // ---- dedup --------------------------------------------------------

  def dedupExact(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame =
    extra.Dedup.exactByKey(df, keys, orderCol)

  def dedupLatest(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String): DataFrame =
    extra.Dedup.latestWins(df, keys, tsCol, tieCol)

  def nearDupMinhash(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame =
    extra.Dedup.nearDupMinhash(docs, idCol, textCol, threshold = threshold)

  def nearDupJaccard(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame =
    extra.Dedup.ngramJaccard(docs, idCol, textCol, threshold = threshold)

  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    extra.Dedup.simhash(docs, idCol, textCol)

  /** Incremental ingest dedup: per-NEW-doc verdict against the corpus
    * and earlier batch-mates — batch-driven candidates, never
    * corpus×corpus.
    */
  def nearDupIncremental(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame =
    extra.Dedup.nearDupIncremental(corpus, batch, idCol, textCol,
      threshold = threshold)

  /** Near-dup GROUPS from a pair list: connected components, cluster_id
    * = smallest reachable id (keep one representative per cluster).
    */
  def dupClusters(pairs: DataFrame): DataFrame =
    extra.Dedup.dupClusters(pairs)

  /** End-to-end curation verdict: quality gate → language gate → exact
    * dedup → near-dup removal → train/val/test split. One row per input
    * doc; `filter(status = 'kept')` derives the corpus.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: extra.Curation.Config = extra.Curation.Config()): DataFrame =
    extra.Curation.curate(docs, idCol, textCol, cfg)

  /** Embedding near-dup via multi-table LSH candidates + exact cosine
    * verify — the plan that survives a large corpus.
    */
  def nearDupEmbedding(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    extra.Dedup.embeddingNearDupLsh(emb, idCol, vecCol, threshold)

  /** All-pairs exact baseline — small corpora / recall measurement only. */
  def nearDupEmbeddingExact(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    extra.Dedup.embeddingNearDup(emb, idCol, vecCol, threshold)

  /** SemDeDup: coarse-quantizer clusters + within-cluster cosine ≥
    * threshold; keeps the min-id representative per similarity group.
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numClusters: Int = 32): DataFrame =
    extra.Dedup.semDedup(emb, idCol, vecCol, threshold, numClusters)

  // ---- persisted incremental-dedup indexes ---------------------------
  // (the amortized forms: the corpus side is served from storage; each
  // index also has a streaming leg under graft.streaming.*Ingest)

  /** Build / batch-verdict / append / takedown on the persisted MinHash
    * band index ([[extra.MinhashIndex]]) — lexical near-dup served from
    * storage; verdicts ≡ [[nearDupIncremental]](indexed docs, batch).
    */
  def buildMinhashIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit =
    extra.MinhashIndex.build(docs, idCol, textCol, dir)

  def minhashIndexDedupBatch(spark: SparkSession, dir: String,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame =
    extra.MinhashIndex.dedupBatch(spark, dir, batch, idCol, textCol,
      threshold)

  def deleteFromMinhashIndex(spark: SparkSession, dir: String,
      ids: DataFrame, idCol: String = "d"): Long =
    extra.MinhashIndex.delete(spark, dir, ids, idCol)

  /** Build / batch-verdict / takedown on the persisted semantic-dedup
    * index ([[extra.SemanticIndex]]) — embedding-space near-dup served
    * from storage under a frozen coarse codebook; over-budget batches
    * auto-split their broadcast probe (r16).
    */
  def buildSemanticIndex(emb: DataFrame, idCol: String, vecCol: String,
      dir: String, numClusters: Int = 32): Unit =
    extra.SemanticIndex.build(emb, idCol, vecCol, dir, numClusters)

  def semanticIndexDedupBatch(spark: SparkSession, dir: String,
      batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    extra.SemanticIndex.dedupBatch(spark, dir, batch, idCol, vecCol,
      threshold)

  def deleteFromSemanticIndex(spark: SparkSession, dir: String,
      ids: DataFrame, idCol: String = "d"): Long =
    extra.SemanticIndex.delete(spark, dir, ids, idCol)

  /** Live segments + ledger tokens of ANY manifest-committed index
    * (BM25 / ANN / MinHash / substring / semantic) as a DataFrame —
    * the size ladder the tiered auto-compaction is tuned by
    * ([[extra.IndexStats.stats]]; also the `graft_index_stats` TVF).
    */
  def indexStats(spark: SparkSession, dir: String): DataFrame =
    extra.IndexStats.stats(spark, dir)

  /** Build / batch-span-dedup on the persisted duplicated-gram posting
    * index ([[extra.SubstrIndex]]) — incremental ExactSubstr; output ≡
    * global span dedup restricted to the batch (takedown here is a
    * rebuild — the min-summaries are not invertible, see its scaladoc).
    */
  def buildSubstrIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String, k: Int = 5, hashed: Boolean = true): Unit =
    extra.SubstrIndex.build(docs, idCol, textCol, dir, k, hashed)

  def substrIndexDedupBatch(spark: SparkSession, dir: String,
      batch: DataFrame, idCol: String, textCol: String,
      minSpanTokens: Int = 0): DataFrame =
    extra.SubstrIndex.dedupBatch(spark, dir, batch, idCol, textCol,
      minSpanTokens)

  // ---- similarity search --------------------------------------------

  def similarTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame =
    extra.Similarity.topKBruteForce(emb, idCol, vecCol, queryPred, k)

  def similarTopKLsh(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame =
    extra.Similarity.topKLsh(emb, idCol, vecCol, queryPred, k)

  /** Multi-table LSH: collide in ANY of `tables` hash tables — the
    * production recall shape.
    */
  def similarTopKLshMulti(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, tables: Int = 4, bits: Int = 4): DataFrame =
    extra.Similarity.topKLshMulti(emb, idCol, vecCol, queryPred, k, tables, bits)

  /** IVF with a deterministic sample codebook (oracle-reproducible). */
  def similarTopKIvf(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, numCentroids: Int = 32,
      nprobe: Int = 3): DataFrame =
    extra.Similarity.topKIvf(emb, idCol, vecCol, queryPred, k, numCentroids,
      nprobe)

  /** Product-quantized top-k: m one-byte codes per vector + ADC table
    * lookups, exact re-rank on the shortlist.
    */
  def similarTopKPq(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, m: Int = 8, numCentroids: Int = 16,
      candFactor: Int = 3): DataFrame =
    extra.Similarity.topKPq(emb, idCol, vecCol, queryPred, k, m,
      numCentroids, candFactor)

  /** IVF-PQ: nprobe posting lists scored by PQ byte codes (ADC),
    * exact re-rank on the shortlist — the composed 100 TB index shape.
    */
  def similarTopKIvfPq(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, numCentroids: Int = 32, nprobe: Int = 3,
      m: Int = 8, pqCentroids: Int = 16, candFactor: Int = 3): DataFrame =
    extra.Similarity.topKIvfPq(emb, idCol, vecCol, queryPred, k,
      numCentroids, nprobe, m, pqCentroids, candFactor)

  /** IVF with a spherical-k-means-trained codebook (production build). */
  def similarTopKIvfKmeans(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, numCentroids: Int = 32, iters: Int = 5,
      nprobe: Int = 3): DataFrame =
    extra.Similarity.topKIvfKmeans(emb, idCol, vecCol, queryPred, k,
      numCentroids, iters, nprobe)

  /** Train a spherical k-means IVF codebook (one shuffle per iteration). */
  def kmeansCodebook(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Seq[extra.Similarity.Centroid] =
    extra.Similarity.kmeansCodebook(emb, idCol, vecCol, k, iters)

  /** Train a per-subspace k-means PQ codebook (one treeAggregate pass
    * per iteration); feed it to [[similarTopKPq]] via
    * `Similarity.topKPq(codebook = Some(...))` or to `buildIvfPq`'s
    * `pqCodebook` for the production index build.
    */
  def kmeansPqCodebook(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, numCentroids: Int, iters: Int): Seq[extra.Similarity.Centroid] =
    extra.Similarity.kmeansPqCodebook(emb, idCol, vecCol, m,
      numCentroids, iters)

  /** Build an IVF-PQ index and persist it partitioned by posting list
    * (build once, query many); search the result with
    * `Similarity.searchIvfPq` — it prunes to the probed partitions.
    */
  def buildAndWriteAnnIndex(emb: DataFrame, idCol: String, vecCol: String,
      dir: String, numCentroids: Int = 32, m: Int = 8,
      pqCentroids: Int = 16): Option[extra.Similarity.IvfPqIndex] =
    extra.AnnIndex.buildAndWriteIvfPq(emb, idCol, vecCol, dir,
      numCentroids, m, pqCentroids)

  /** Read a persisted IVF-PQ index written by [[buildAndWriteAnnIndex]]. */
  def readAnnIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): extra.Similarity.IvfPqIndex =
    extra.AnnIndex.readIvfPq(spark, dir)

  /** Incrementally append new vectors to a persisted ANN index using
    * its frozen codebooks (one projection + one partitioned append —
    * the corpus is never re-encoded).
    */
  def appendAnnIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, emb: DataFrame, idCol: String, vecCol: String): Unit =
    extra.AnnIndex.appendIvfPq(spark, dir, emb, idCol, vecCol)

  /** Build-once persisted BM25 index (tf/dl/df/meta layout) — the
    * sparse-retrieval mirror of [[buildAndWriteAnnIndex]].
    */
  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String,
      dir: String, numFiles: Int = 8): Unit =
    extra.Bm25Index.build(docs, idCol, textCol, dir, numFiles)

  /** Incrementally append a document batch to a persisted BM25 index
    * (pure parquet appends; the corpus is never re-tokenized) — the
    * sparse mirror of [[appendAnnIndex]].
    */
  def appendBm25Index(docs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit =
    extra.Bm25Index.append(docs, idCol, textCol, dir)

  /** Multi-query BM25 top-k served from a persisted index — term-pruned
    * posting reads, no corpus scan.
    */
  def bm25SearchIndexed(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame, queryIdCol: String,
      queryTextCol: String, idCol: String = "id",
      topK: Int = 20): DataFrame =
    extra.Bm25Index.searchAll(spark, dir, queries, queryIdCol,
      queryTextCol, idCol, topK = topK)

  /** Streaming ANN ingest: curated doc stream → embed → incremental
    * append into a persisted index, per micro-batch.
    */
  def startAnnIngest(curated: DataFrame, indexDir: String,
      checkpointDir: String, dim: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streaming.AnnIngest.start(curated, indexDir, checkpointDir, dim)

  /** Streaming sparse ingest: curated doc stream → per-micro-batch
    * append into a persisted BM25 index (creates it on first batch).
    */
  def startBm25Ingest(curated: DataFrame, indexDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streaming.AnnIngest.startBm25(curated, indexDir, checkpointDir)

  /** Codegen'd dot product over float/double array columns. */
  def dot(a: Column, b: Column): Column =
    functions.GraftFunctions.dot_product(a, b)

  // ---- corpus table maintenance -------------------------------------

  /** Keyed copy-on-write upsert into a clustered parquet corpus —
    * footer-stats file pruning, untouched files never move.
    */
  def mergeUpsert(spark: org.apache.spark.sql.SparkSession, dir: String,
      updates: DataFrame, key: String): extra.Merge.MergeStats =
    extra.Merge.upsert(spark, dir, updates, key)

  /** Version-guarded CDC apply: stale rows discarded, replays
    * idempotent — the form [[startMergeStream]] applies per batch.
    */
  def mergeUpsertVersioned(spark: org.apache.spark.sql.SparkSession,
      dir: String, updates: DataFrame, key: String,
      versionCol: String): extra.Merge.MergeStats =
    extra.Merge.upsertVersioned(spark, dir, updates, key, versionCol)

  /** Takedown / right-to-be-forgotten purge from a clustered corpus
    * table; pair with [[deleteFromBm25Index]]/[[deleteFromAnnIndex]] to
    * purge the serving indexes too.
    */
  def mergeDelete(spark: org.apache.spark.sql.SparkSession, dir: String,
      keys: DataFrame, key: String): extra.Merge.MergeStats =
    extra.Merge.delete(spark, dir, keys, key)

  /** LSM tombstone delete from a persisted BM25 index (membership exact
    * immediately; run [[extra.Bm25Index.compact]] to make it physical).
    */
  def deleteFromBm25Index(spark: org.apache.spark.sql.SparkSession,
      dir: String, ids: DataFrame, idCol: String = "id"): Long =
    extra.Bm25Index.delete(spark, dir, ids, idCol)

  /** LSM tombstone delete from a persisted ANN index (bit-equivalent to
    * an index built without those rows; [[extra.AnnIndex.compact]]
    * purges physically).
    */
  def deleteFromAnnIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, ids: DataFrame, idCol: String = "id"): Unit =
    extra.AnnIndex.delete(spark, dir, ids, idCol)

  /** Streaming CDC apply: change stream → version-guarded upsert per
    * micro-batch ([[streaming.MergeStream]]).
    */
  def startMergeStream(changes: DataFrame, tableDir: String,
      checkpointDir: String, key: String, versionCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streaming.MergeStream.start(changes, tableDir, checkpointDir, key,
      versionCol)

  // ---- snapshot-versioned tables -------------------------------------

  /** Version-guarded CDC apply as a NEW snapshot version; `txn` is the
    * exactly-once token [[startSnapshotStream]] commits per batch.
    */
  def snapshotUpsertVersioned(spark: org.apache.spark.sql.SparkSession,
      dir: String, updates: DataFrame, key: String, versionCol: String,
      txn: Option[(String, Long)] = None): extra.Snapshots.Commit =
    extra.Snapshots.upsertVersioned(spark, dir, updates, key,
      versionCol, txn)

  /** Streaming CDC into a snapshot table: each micro-batch commits an
    * isolated, time-travelable version; replays are skipped via the
    * manifest-committed transaction token — exactly-once
    * ([[streaming.SnapshotStream]]).
    */
  def startSnapshotStream(changes: DataFrame, tableDir: String,
      checkpointDir: String, key: String, versionCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streaming.SnapshotStream.start(changes, tableDir, checkpointDir,
      key, versionCol)

  /** Create a snapshot table (manifest-versioned, time-travelable).
    * `statsCols` picks secondary columns whose per-file (min, max)
    * every commit records in the manifest — what [[snapshotReadRange]]
    * prunes on.
    */
  def snapshotInit(df: DataFrame, dir: String, key: String,
      numFiles: Int = 8,
      statsCols: Seq[String] = Nil): extra.Snapshots.Commit =
    extra.Snapshots.init(df, dir, key, numFiles, statsCols)

  /** Read a snapshot version (latest by default). */
  def snapshotRead(spark: org.apache.spark.sql.SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame =
    extra.Snapshots.read(spark, dir, asOf)

  /** Upsert as a NEW version — cold files shared by reference. With
    * `evolveSchema`, new columns in `updates` widen the table schema
    * (nullable; untouched files are NOT rewritten — readers fill the
    * added columns with NULL from the manifest-recorded schema).
    */
  def snapshotUpsert(spark: org.apache.spark.sql.SparkSession,
      dir: String, updates: DataFrame, key: String,
      evolveSchema: Boolean = false): extra.Snapshots.Commit =
    extra.Snapshots.upsert(spark, dir, updates, key, evolveSchema)

  /** A version's resolved schema — O(manifest), no data file opened. */
  def snapshotSchema(spark: org.apache.spark.sql.SparkSession,
      dir: String, asOf: Option[Long] = None)
      : org.apache.spark.sql.types.StructType =
    extra.Snapshots.tableSchema(spark, dir, asOf)

  /** Keyed takedown as a new version (history keeps the old rows
    * until [[snapshotVacuum]] drops their versions).
    */
  def snapshotDelete(spark: org.apache.spark.sql.SparkSession,
      dir: String, keys: DataFrame, key: String): extra.Snapshots.Commit =
    extra.Snapshots.delete(spark, dir, keys, key)

  /** CDC extract between versions — reads only non-shared files. */
  def snapshotDiff(spark: org.apache.spark.sql.SparkSession, dir: String,
      fromV: Long, toV: Long, key: String): DataFrame =
    extra.Snapshots.diff(spark, dir, fromV, toV, key)

  /** Point read: keys open only the manifest-range-matched files of
    * one committed version (zero footer opens on stats-bearing
    * manifests).
    */
  def snapshotLookup(spark: org.apache.spark.sql.SparkSession,
      dir: String, keys: DataFrame, key: String,
      asOf: Option[Long] = None): DataFrame =
    extra.Snapshots.lookup(spark, dir, keys, key, asOf)

  /** Range read pruned on any stats-bearing column — the cluster key
    * or a `statsCols` secondary column (e.g. a "last N hours" read
    * over a key-clustered table whose commits arrive in time order).
    * Inclusive bounds; exact predicate applied on top of the file
    * skipping.
    */
  def snapshotReadRange(spark: org.apache.spark.sql.SparkSession,
      dir: String, column: String, lo: Any, hi: Any,
      asOf: Option[Long] = None): DataFrame =
    extra.Snapshots.readRange(spark, dir, column, lo, hi, asOf)

  /** Defragment as a new version (diff-empty; history intact). */
  def snapshotCompact(spark: org.apache.spark.sql.SparkSession,
      dir: String, key: String): extra.Snapshots.Commit =
    extra.Snapshots.compact(spark, dir, key)

  /** GC versions below the floor + orphaned data files past grace. */
  def snapshotVacuum(spark: org.apache.spark.sql.SparkSession,
      dir: String, retainFrom: Long): Seq[String] =
    extra.Snapshots.vacuum(spark, dir, retainFrom)

  /** Roll back by committing toVersion's content as a NEW version
    * (append-only history, manifest-only cost — no data IO).
    */
  def snapshotRestore(spark: org.apache.spark.sql.SparkSession,
      dir: String, toVersion: Long): extra.Snapshots.Commit =
    extra.Snapshots.restore(spark, dir, toVersion)

  // ---- incremental materialized aggregates ----------------------------

  /** Build a materialized aggregate view's partial-agg state. */
  def viewInit(rows: DataFrame, spec: extra.IncrementalAgg.ViewSpec,
      dir: String, numFiles: Int = 8): Unit =
    extra.IncrementalAgg.init(rows, spec, dir, numFiles)

  /** O(delta + touched state) refresh with new rows. */
  def viewRefresh(spark: org.apache.spark.sql.SparkSession, dir: String,
      deltaRows: DataFrame, spec: extra.IncrementalAgg.ViewSpec)
      : extra.Merge.MergeStats =
    extra.IncrementalAgg.refresh(spark, dir, deltaRows, spec)

  /** Retraction refresh from a snapshot change feed (count/sum views). */
  def viewRefreshFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      viewDir: String, snapDir: String, fromV: Long, toV: Long,
      snapKey: String, spec: extra.IncrementalAgg.ViewSpec)
      : extra.Merge.MergeStats =
    extra.IncrementalAgg.refreshFromSnapshot(spark, viewDir, snapDir,
      fromV, toV, snapKey, spec)

  /** Serve the view (HLL estimates finalized, exact decimal means). */
  def viewServe(spark: org.apache.spark.sql.SparkSession, dir: String,
      spec: extra.IncrementalAgg.ViewSpec): DataFrame =
    extra.IncrementalAgg.finalizeView(
      extra.IncrementalAgg.read(spark, dir), spec)

  /** Streaming view maintenance with an applied-batch ledger. */
  def startViewStream(rows: DataFrame, viewDir: String,
      checkpointDir: String, spec: extra.IncrementalAgg.ViewSpec)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streaming.ViewStream.start(rows, viewDir, checkpointDir, spec)

  /** SCD enrichment: stream ⋈ latest snapshot dim, per trigger. */
  def startSnapshotDimStream(rows: DataFrame, snapDir: String,
      keys: Seq[String], checkpointDir: String,
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streaming.SnapshotDim.start(rows, snapDir, keys, checkpointDir, sink)

  // ---- join/runtime-filter & sketch utilities -------------------------

  /** Bloom-prefiltered large⋈large join (bit-identical to the plain
    * join; inner/left_semi only).
    */
  def bloomJoin(big: DataFrame, bigKeys: Seq[String], small: DataFrame,
      smallKeys: Seq[String], joinType: String = "inner"): DataFrame =
    ops.Joins.bloomPrefilteredJoin(big, bigKeys, small, smallKeys,
      joinType = joinType)

  /** Exact heavy hitters above `minShare` via Misra-Gries sketch +
    * exact verify pass (no shuffle of the item stream).
    */
  def heavyHitters(df: DataFrame, itemCol: String,
      minShare: Double): DataFrame =
    functions.MisraGries.exactHeavyHitters(df, itemCol, minShare)

  // ---- text analysis ------------------------------------------------

  def textQuality(docs: DataFrame, textCol: String): DataFrame =
    extra.Text.withQuality(docs, textCol)

  def languageId(docs: DataFrame, textCol: String): DataFrame =
    extra.Text.withLanguageId(docs, textCol)

  def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    extra.Text.withTokenCounts(docs, textCol)

  /** EXACT subword token counts under a trained BPE merge list, tier
    * selected by vocabulary size ([[extra.Text.withBpeTokensAuto]]):
    * the oracle-replayable expression form up to
    * [[extra.Text.BpeExprMaxMerges]] merges, the broadcast +
    * mapPartitions typed tier above it (bit-identical, spec-pinned).
    * Train the list with [[extra.Text.trainBpe]].
    */
  def bpeTokenCounts(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    extra.Text.withBpeTokensAuto(docs, textCol, merges)

  /** Train a BPE merge list and commit it as a NEW version of a
    * persisted tokenizer model ([[extra.BpeModel]] — the registry
    * semantics the classifier model uses: refreshes supersede the
    * head, prior versions stay loadable for corpus reproducibility).
    */
  def trainBpeModel(docs: DataFrame, textCol: String, numMerges: Int,
      modelDir: String, maxWords: Int = 10000): Long =
    extra.BpeModel.train(docs, textCol, numMerges, modelDir, maxWords)

  /** Loads a persisted tokenizer's merge list (head version,
    * memoized per head signature). Time travel via
    * [[extra.BpeModel.loadVersion]]; SQL serving via
    * `graft_bpe_count`.
    */
  def loadBpeModel(spark: org.apache.spark.sql.SparkSession,
      modelDir: String): Seq[(String, String)] =
    extra.BpeModel.load(spark, modelDir)

  def fingerprint(docs: DataFrame, textCol: String): DataFrame =
    extra.Text.withFingerprint(docs, textCol)

  /** Self-trained unigram LM cross-entropy per doc (perplexity proxy). */
  def unigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    extra.Text.unigramScore(docs, idCol, textCol)

  /** Interpolated Kneser–Ney trigram cross-entropy per doc — the
    * CCNet/KenLM quality-filter signal ([[extra.Text.kneserNeyScore]]).
    */
  def kneserNeyScore(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame =
    extra.Text.kneserNeyScore(docs, idCol, textCol, discount)

  /** Fits a servable KN trigram LM ([[extra.KnLm.fit]]) — score any
    * frame against it with full OOV backoff via [[extra.KnLm.score]];
    * persist/refresh via [[extra.KnLm.save]]; SQL `graft_perplexity`.
    */
  def fitKnLm(docs: DataFrame, textCol: String,
      byCol: Option[String] = None): extra.KnLm.Model =
    extra.KnLm.fit(docs, textCol, byCol = byCol)

  /** Scores any document frame against a fitted/loaded KN LM with the
    * full OOV backoff cascade.
    */
  def scoreKnLm(docs: DataFrame, idCol: String, textCol: String,
      model: extra.KnLm.Model): DataFrame =
    extra.KnLm.score(docs, idCol, textCol, model)

  /** [[scoreKnLm]] in the micro-batch serving shape
    * ([[extra.KnLm.scoreProbed]]): a model too big to broadcast whole
    * is semi-join-filtered to the batch's bounded key set and the
    * survivors broadcast — no model shuffle inside the batch; a model
    * under the broadcast budget (or an over-budget batch) keeps the
    * keyed joins. Runs eager sizing jobs at plan-construction time —
    * use [[scoreKnLm]] where laziness matters.
    */
  def scoreKnLmProbed(docs: DataFrame, idCol: String, textCol: String,
      model: extra.KnLm.Model): DataFrame =
    extra.KnLm.scoreProbed(docs, idCol, textCol, model)

  /** Persists a KN LM as a new registry version; load the head with
    * [[loadKnLm]], pin one with [[extra.KnLm.loadVersion]].
    */
  def saveKnLm(model: extra.KnLm.Model, modelDir: String): Long =
    extra.KnLm.save(model, modelDir)

  def loadKnLm(spark: org.apache.spark.sql.SparkSession,
      modelDir: String): extra.KnLm.Model =
    extra.KnLm.load(spark, modelDir)

  /** CCNet perplexity gate: per-language KN LMs trained in one corpus
    * pass, head/middle/tail cross-entropy quantile buckets
    * ([[extra.Text.perplexityBuckets]]).
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, nBuckets: Int = 3): DataFrame =
    extra.Text.perplexityBuckets(docs, idCol, textCol, langCol, nBuckets)

  /** Per-doc fraction of tokens inside the corpus top-K vocabulary. */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame =
    extra.Text.vocabCoverage(docs, idCol, textCol, topK)

  /** Fixed-size token chunking (context-window prep) — shuffle-free. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame =
    extra.Text.chunkTokens(docs, idCol, textCol, chunkSize)

  /** Fixed-size SUBWORD chunking — context windows measured in BPE
    * tokens under a trained merge list ([[extra.Text.chunkBpeTokens]]).
    */
  def chunkBpeTokens(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], chunkSize: Int): DataFrame =
    extra.Text.chunkBpeTokens(docs, idCol, textCol, merges, chunkSize)

  // ---- time series --------------------------------------------------

  /** As-of join — `direction` ∈ {backward, forward}, optional match
    * tolerance in seconds (pandas merge_asof parity).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, carryCols: Seq[String],
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame =
    extra.TimeSeries.asofJoin(left, right, key, tsCol, carryCols,
      direction, toleranceSeconds)

  /** Native as-of join via the custom Catalyst operator (AsOfJoinExec:
    * one shuffle per side, streaming sort-merge, O(1) state).
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, carryCols: Seq[String]): DataFrame =
    plans.AsOf.join(left, right, key, tsCol, carryCols)

  /** Skew-safe as-of join: same semantics as [[asofJoin]], clustered on
    * (key, time-bucket) so one hypertraded key parallelizes across
    * partitions instead of funneling a single task.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, carryCols: Seq[String],
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None,
      bucketSeconds: Long = 86400L): DataFrame =
    extra.TimeSeries.asofJoinBucketed(left, right, key, tsCol, carryCols,
      direction, toleranceSeconds, bucketSeconds)

  def sessionize(df: DataFrame, key: String, tsCol: String,
      gapSeconds: Long): DataFrame =
    extra.TimeSeries.sessionize(df, key, tsCol, gapSeconds)

  def ohlc(df: DataFrame, key: String, tsCol: String, valCol: String,
      bucket: String): DataFrame =
    extra.TimeSeries.ohlc(df, key, tsCol, valCol, bucket)

  // ---- sampling / splits --------------------------------------------

  /** Partitioning-independent train/val/test assignment (content hash). */
  def trainTestSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    extra.Sampling.withSplit(df, idCol, trainPct, valPct)

  /** Partitioning-independent fraction sample (content hash). */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    extra.Sampling.deterministicSample(df, idCol, fraction)

  /** Per-class deterministic rebalancing sample. */
  def stratifiedSample(df: DataFrame, idCol: String, classCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame =
    extra.Sampling.stratifiedSample(df, idCol, classCol, fractions,
      defaultFraction)

  /** Keep each row with probability = its weight column (hash-gated). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    extra.Sampling.weightedSample(df, idCol, weight)

  /** Weighted per-domain epoch mixing — the pre-training mixture
    * primitive (rate 2.5 → 2 guaranteed epochs + a hash-gated
    * fractional one).
    */
  def mixDomains(df: DataFrame, idCol: String, domainCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame =
    extra.Sampling.mixDomains(df, idCol, domainCol, rates, defaultRate)

  /** Benchmark decontamination: flag corpus docs sharing any n-token
    * shingle with an arbitrary benchmark frame (broadcast semi-join).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      n: Int = 5): DataFrame =
    extra.Text.decontaminate(corpus, benchmark, idCol, textCol,
      benchTextCol, n)

  /** Global row number over a total order WITHOUT the one-task window. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      out: String): (DataFrame, Long) =
    ops.Ranks.withGlobalRowNumber(df, sortCols, out)

  /** Global running sum over a total order WITHOUT the one-task window
    * (token-budget selection: order by quality, cut at the budget).
    */
  def globalPrefixSum(df: DataFrame, sortCols: Seq[Column],
      valueOf: Column, out: String): DataFrame =
    ops.Ranks.withGlobalPrefixSum(df, sortCols, valueOf, out)

  /** Grouped row number / running sum over `PARTITION BY groupCols`
    * without the one-task-per-group window (two-pass range shuffle;
    * window fallback past a group-cardinality budget). The grouped
    * prefix sum is the per-domain token-budget primitive: order each
    * group by quality, cut where ITS running total crosses the cap.
    */
  def groupedRowNumber(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], out: String,
      totalOut: Option[String] = None): DataFrame =
    ops.Ranks.withGroupedRowNumber(df, groupCols, sortCols, out, totalOut)

  def groupedPrefixSum(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], valueOf: Column, out: String): DataFrame =
    ops.Ranks.withGroupedPrefixSum(df, groupCols, sortCols, valueOf, out)

  /** Greedy fixed-token-budget sequence packing (content-hash shards). */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
      budget: Long, shards: Int = 64): DataFrame =
    extra.Packing.packGreedy(df, idCol, tokenCount, budget, shards)

  /** Trainer-ready packed sequences: one row per greedy-filled bin,
    * carrying the concatenated token-ID stream (corpus-vocab ids,
    * EOS = 0 after every doc, budget-counted). `syms` is the per-doc
    * subword array, e.g. `extra.Text.bpeSymbols(col(textCol), merges)`.
    */
  def packExamples(df: DataFrame, idCol: String, syms: Column,
      budget: Long, shards: Int = 64, vocabCap: Int = 65536): DataFrame =
    extra.Packing.packExamples(df, idCol, syms, budget, shards, vocabCap)

  // ---- storage layout ------------------------------------------------

  /** Range-clustered parquet write: per-file disjoint key ranges →
    * footer min/max prunes whole files on point/range predicates.
    */
  def writeClustered(df: DataFrame, path: String, cols: Seq[Column],
      numFiles: Int): Unit =
    extra.Layout.writeClustered(df, path, cols, numFiles)

  /** Z-order clustered write: multi-dimensional file skipping. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bitsPerDim: Int = 8): Unit =
    extra.Layout.writeZOrdered(df, path, cols, numFiles, bitsPerDim)

  /** Bin-pack micro-batch shards into target-sized files. */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetFileBytes: Long = 128L << 20): (Int, Int) =
    extra.Layout.compact(spark, srcDir, dstDir, targetFileBytes)

  // ---- skew / observability -----------------------------------------

  /** Salted join for hot keys — result-identical to a direct join. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int, leftSaltSource: Column): DataFrame =
    ops.Skew.saltedJoin(left, right, keys, buckets, leftSaltSource)

  /** Attach a streaming KPI monitor (per-batch progress as a DataFrame). */
  def monitor(spark: SparkSession): streaming.Monitor =
    new streaming.Monitor().attach(spark)

  // ---- multimodal ----------------------------------------------------

  def mediaMeta(docs: DataFrame) =
    extra.Multimodal.extractMeta(extra.Multimodal.assetsFromDocuments(docs))

  def mediaFeatures(docs: DataFrame) =
    extra.Multimodal.extractFeatures(
      extra.Multimodal.assetsFromDocuments(docs))

  // ---- market analytics ----------------------------------------------

  /** Bollinger bands over the daily mean series (decimal-exact). */
  def bollinger(df: DataFrame, key: String, tsCol: String, valCol: String,
      windowDays: Int = 7, k: Double = 2.0): DataFrame =
    extra.Indicators.bollinger(df, key, tsCol, valCol, windowDays, k)

  /** RSI (SMA form) over the daily mean series. */
  def rsi(df: DataFrame, key: String, tsCol: String, valCol: String,
      windowDays: Int = 14): DataFrame =
    extra.Indicators.rsi(df, key, tsCol, valCol, windowDays)

  /** EWMA of the daily mean series (per-key ordered fold). */
  def ewma(df: DataFrame, key: String, tsCol: String, valCol: String,
      alpha: Double = 0.3): DataFrame =
    extra.Indicators.ewma(df, key, tsCol, valCol, alpha)

  /** Daily volume-weighted average price (decimal-exact). */
  def vwap(df: DataFrame, key: String, tsCol: String, priceCol: String,
      qtyCol: String): DataFrame =
    extra.Analytics.vwap(df, key, tsCol, priceCol, qtyCol)

  /** Max peak-to-trough drawdown per key over the daily series. */
  def maxDrawdown(df: DataFrame, key: String, tsCol: String,
      valCol: String): DataFrame =
    extra.Analytics.maxDrawdown(df, key, tsCol, valCol)

  /** Pairwise Pearson correlation of bucketed series (exact moments). */
  def pairCorrelation(df: DataFrame, key: String, tsCol: String,
      valCol: String, bucket: String = "hour"): DataFrame =
    extra.Analytics.pairCorrelation(df, key, tsCol, valCol, bucket)

  /** Rolling windowed correlation for a list of key pairs. */
  def rollingCorrelation(df: DataFrame, key: String, tsCol: String,
      valCol: String, keyPairs: Seq[(String, String)],
      windowN: Int = 24): DataFrame =
    extra.Analytics.rollingCorrelation(df, key, tsCol, valCol, keyPairs,
      windowN = windowN)

  /** Fixed-grid LOCF resampling with gap flags. */
  def gapFill(df: DataFrame, key: String, tsCol: String, valCol: String,
      tieCol: String, stepUnit: String = "hour"): DataFrame =
    extra.Analytics.gapFill(df, key, tsCol, valCol, tieCol, stepUnit)

  /** Median/MAD robust anomaly fences per key (exact medians). */
  def anomalyMad(df: DataFrame, key: String, valCol: String,
      k: Double = 5.0): DataFrame =
    extra.Analytics.anomalyMad(df, key, valCol, k)

  /** Single-pass sketch-median MAD fences (the 100 TB path). */
  def anomalyMadApprox(df: DataFrame, key: String, valCol: String,
      k: Double = 5.0): DataFrame =
    extra.Analytics.anomalyMadApprox(df, key, valCol, k)

  /** Streaming per-symbol anomalies: O(1) Welford state per key. */
  def anomalyStream(ticks: Dataset[Tick], k: Double = 4.0,
      minObs: Long = 30L) =
    streaming.Stateful.anomaliesPerSymbol(ticks, k, minObs)

  /** Streaming feed-silence alerts via event-time timeouts (state is
    * removed once a key fires — dead symbols cost nothing forever).
    */
  def silenceAlerts(ticks: Dataset[Tick], silenceMs: Long) =
    streaming.Stateful.silenceAlerts(ticks, silenceMs)

  // ---- retrieval / graph ---------------------------------------------

  /** BM25 top-k lexical retrieval (decimal-exact score pipeline). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int = 20): DataFrame =
    extra.Retrieval.bm25Search(docs, idCol, textCol, queryTerms,
      topK = topK)

  /** Multi-query BM25 against an arbitrary (id, text) query frame. */
  def bm25All(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      topK: Int = 20): DataFrame =
    extra.Retrieval.bm25SearchAll(docs, idCol, textCol, queries,
      queryIdCol, queryTextCol, topK = topK)

  /** Reciprocal-rank fusion of two ranked retrieval arms (each carries
    * queryIdCol, idCol and a 1-based `rank` column).
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, queryIdCol: String,
      idCol: String, rrfK: Int = 60, topK: Int = 10): DataFrame =
    extra.Retrieval.rrfFuse(sparse, dense, queryIdCol, idCol, rrfK, topK)

  /** Self-trained bigram-LM cross-entropy per document (add-one
    * smoothing; docs with fewer than two tokens drop).
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    extra.Text.bigramScore(docs, idCol, textCol)

  /** Fixed-point PageRank (integer arithmetic, fixed iterations). */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10): DataFrame =
    extra.Graph.pagerank(edges, srcCol, dstCol, iters)

  /** Exact triangle census + global clustering coefficient
    * (degree-oriented wedge join — one row out).
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    extra.Graph.triangles(edges, srcCol, dstCol)

  /** Depth-bounded BFS hop distances from a seed node (Scala-driven
    * frontier loop — one keyed join per level, never UnionLoop
    * re-planning).
    */
  def bfs(edges: DataFrame, srcCol: String, dstCol: String,
      seed: Column, maxDepth: Int): DataFrame =
    extra.Graph.bfs(edges, srcCol, dstCol, seed, maxDepth)

  /** Connected components (min-label propagation + pointer doubling;
    * throws rather than return unconverged labels).
    */
  def connectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxIters: Int = 20): DataFrame =
    extra.Graph.connectedComponents(edges, srcCol, dstCol, maxIters)

  /** DSIR importance log-weights toward a target domain (Xie et al.
    * 2023): resample the raw corpus ∝ exp(log_weight) to approximate
    * the target distribution.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame =
    extra.Text.dsirWeights(docs, idCol, textCol, isTarget)

  /** Trains a multinomial Naive Bayes classifier on `(labelCol,
    * textCol)` — the model-based filtering stage of a curation pipeline
    * (CCNet/GPT-3 bootstrap: seed labels from a heuristic, let the
    * model generalize). Training is pure counting: deterministic,
    * engine-replayable, one token-universe shuffle.
    */
  def trainClassifier(docs: DataFrame, labelCol: String,
      textCol: String): extra.Classifier.NaiveBayesModel =
    extra.Classifier.trainNaiveBayes(docs, labelCol, textCol)

  /** Per-(doc, class) exact-decimal log-posteriors under a fitted
    * [[trainClassifier]] model.
    */
  def classifyScores(docs: DataFrame, idCol: String, textCol: String,
      model: extra.Classifier.NaiveBayesModel): DataFrame =
    extra.Classifier.scoreNaiveBayes(docs, idCol, textCol, model)

  /** Argmax classification (score desc, label asc tie-break) — one row
    * per document: `idCol`, `predicted`, `score`.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      model: extra.Classifier.NaiveBayesModel): DataFrame =
    extra.Classifier.predictNaiveBayes(docs, idCol, textCol, model)

  /** Near-dup pairs over any 56-bit-or-narrower fingerprint column
    * (simhash / image dHash / audio energy hash): banded-LSH candidates
    * + exact Hamming verify.
    */
  def hashNearDup(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 8): DataFrame =
    extra.Dedup.hashNearDup(hashes, idCol, hashCol, maxHamming = maxHamming)

  /** CEP: strict-contiguous pattern matches (MATCH_RECOGNIZE
    * `PATTERN (A B C)`) per key — window-only, oracle-exact.
    */
  def matchContiguous(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, pattern: Seq[String], withinMs: Long,
      tieCol: String): DataFrame =
    extra.Cep.matchContiguous(df, keyCol, tsCol, typeCol, pattern,
      withinMs, tieCol)

  /** CEP: greedy skip-till-next-match detection (gaps allowed,
    * non-overlapping) — the default discipline of most CEP engines.
    * `keyCol` must be NUMERIC (it is cast to long for the typed state
    * row); pre-hash string keys with `xxhash64(key)` — see
    * [[extra.Cep.matchSkipTillNext]]'s key contract.
    */
  def matchSkipTillNext(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, pattern: Seq[String], withinMs: Long,
      tieCol: String): Dataset[extra.Cep.SeqMatch] =
    extra.Cep.matchSkipTillNext(df, keyCol, tsCol, typeCol, pattern,
      withinMs, tieCol)

  /** STREAMING CEP: the skip-till-next automaton as bounded per-key
    * operator state — matches emit in the micro-batch that closes them.
    */
  def cepStream(events: Dataset[streaming.Stateful.CepEvent],
      pattern: Seq[String], withinMs: Long) =
    streaming.Stateful.cepPerKey(events, pattern, withinMs)

  /** Count-Min sketch cells (deterministic fixed-constant hashes —
    * additive, mergeable, O(w) however large the input).
    */
  def countMinCells(df: DataFrame, keyCol: String, w: Int = 256): DataFrame =
    extra.Stats.countMinCells(df, keyCol, w)

  /** Point-frequency estimates from a Count-Min cell frame (never
    * undercounts; overshoot bounded by ~e/w of the total count).
    */
  def countMinEstimate(cells: DataFrame, probes: DataFrame,
      keyCol: String, w: Int = 256): DataFrame =
    extra.Stats.countMinEstimate(cells, probes, keyCol, w)

  /** 2-D skyline (Pareto frontier) under (minimize, maximize) — the
    * sort-based distributed shape, never an all-pairs anti-join.
    */
  def skyline2d(df: DataFrame, minimizeCol: String,
      maximizeCol: String): DataFrame =
    extra.Stats.skyline2d(df, minimizeCol, maximizeCol)

  /** N-stage ordered conversion funnel with exact mean latencies. */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame =
    extra.Analytics.funnel(df, userCol, tsCol, typeCol, stages)

  /** First-seen cohort × day-offset active-user triangle. */
  def cohortRetention(df: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    extra.Analytics.cohortRetention(df, userCol, tsCol)

  /** Per-key Shannon entropy of a categorical column (bits). */
  def categoryEntropy(df: DataFrame, key: String, catCol: String): DataFrame =
    extra.Analytics.categoryEntropy(df, key, catCol)

  /** Per-key equi-width histogram between the key's own extents. */
  def histogram(df: DataFrame, key: String, valCol: String,
      bins: Int = 10): DataFrame =
    extra.Analytics.histogram(df, key, valCol, bins)

  /** Exact interpolated per-key quantiles (rank-selection form). */
  def exactQuantiles(df: DataFrame, key: String, valCol: String,
      ps: Seq[Double]): DataFrame =
    extra.Stats.exactQuantiles(df, key, valCol, ps)

  /** Welch two-sample t-test per key (variant column 0/1). */
  def welchTTest(df: DataFrame, key: String, groupCol: String,
      valCol: String): DataFrame =
    extra.Analytics.welchTTest(df, key, groupCol, valCol)

  /** OLS slope/intercept of the daily mean series per key. */
  def olsTrend(df: DataFrame, key: String, tsCol: String,
      valCol: String): DataFrame =
    extra.Analytics.olsTrend(df, key, tsCol, valCol)

  /** Lag-k autocorrelation of the daily mean series per key. */
  def autocorrelation(df: DataFrame, key: String, tsCol: String,
      valCol: String, lagDays: Int = 1): DataFrame =
    extra.Analytics.autocorrelation(df, key, tsCol, valCol, lagDays)

  // ---- dataset quality -----------------------------------------------

  /** Snapshot diff: added/removed/changed keys between two versions. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame =
    extra.Quality.snapshotDiff(oldDf, newDf, keyCol, payloadCols)

  /** Union declarative data-quality checks into one report. */
  def dataQualityReport(checks: Seq[extra.Quality.Check]): DataFrame =
    extra.Quality.checkAll(checks)

  /** Fuzzy join: trigram-blocked Levenshtein record linkage. */
  def fuzzyJoin(left: DataFrame, leftKey: String, leftText: String,
      right: DataFrame, rightKey: String, rightText: String,
      maxDist: Int, maxGramDf: Option[Long] = None): DataFrame =
    extra.Fuzzy.fuzzyJoin(left, leftKey, leftText, right, rightKey,
      rightText, maxDist, maxGramDf = maxGramDf)
}
