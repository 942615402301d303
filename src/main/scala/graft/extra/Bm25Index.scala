package graft.extra

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Persisted BM25 index — the sparse-retrieval mirror of [[AnnIndex]]:
  * the expensive per-corpus work (tokenize + explode + three keyed
  * aggregations) is paid ONCE at build time and written to storage;
  * every search afterwards reads term-pruned slices of the tf frame and
  * one constant-size meta row, never the raw corpus. This kills the two
  * structural costs of [[Retrieval.bm25SearchAll]] at scale: the
  * per-call corpus re-tokenization (a full text scan per query batch)
  * and its two eager driver actions (`docs.count()` + the avgdl head).
  *
  * Layout under `dir` — SEGMENTED, with MANIFEST-COMMITTED versions
  * (the Lucene commit-point discipline, and the same manifest-commit
  * idea as [[Snapshots]]):
  *
  *   - `tf/seg-N/` — (id, term, tf) parquet, RANGE-CLUSTERED on `term`
  *     within each segment ([[Layout.writeClustered]]): each file
  *     covers a disjoint sorted term range, so the search's
  *     `term IN (…)` predicate prunes whole files on parquet footer
  *     min/max — the posting-list read. At 100 TB this is the index
  *     table: a Q-term search reads the ≤Q files per segment whose
  *     ranges cover its terms, never the corpus.
  *   - `dl/seg-N/` — (id, dl): per-doc token length, keyed by id
  *     (joined keyed on the scored rows — |query|·df(term)-bounded,
  *     never corpus-wide).
  *   - `df/seg-N/` — (term, df): per-term document frequency PARTIALS,
  *     same term clustering; the search reads its Q terms, sums the
  *     partials, and broadcasts.
  *   - `meta/seg-N/` — one row (n_docs, sum_dl) per segment: the only
  *     scalars scoring needs. Reading them replaces both eager driver
  *     actions.
  *   - `tombstones/seg-N/` — (id, n, s), present only after a
  *     [[delete]]: ids the searches anti-join out until [[compact]]
  *     makes the deletion physical (Lucene-style deferred purge).
  *   - `_manifests/v*.txt` — one COMMIT POINT per writer operation:
  *     `frame<TAB>segment` lines naming exactly the live segments.
  *     Committed create-fails-if-exists; the version number is a CAS
  *     (a lost race throws rather than silently clobbers).
  *
  * SNAPSHOT ISOLATION (r10 verdict #8): every reader resolves the
  * LATEST COMMITTED manifest once per call and plans only against the
  * segments it names. A concurrent [[append]] writes its new segments
  * beside the live ones and they stay INVISIBLE until its manifest
  * rename lands — a search can never see a torn index (half an
  * append's tf without its meta partial), which the previous
  * directory-scan layout allowed (appends are multi-file and
  * non-atomic). Single WRITER at a time is still the caller's
  * contract (the CAS turns a writer race into an error, not
  * corruption); [[compact]] additionally owns exclusivity against
  * READERS while it physically removes superseded segments, exactly
  * the maintenance contract it had before.
  *
  * The layout is LOG-STRUCTURED: `df/` and `meta/` hold PARTIAL counts
  * (one segment per build/append) that the search read aggregates — a
  * sum over the |query|-bounded df slice and the O(#appends)-row meta,
  * both trivial at read time. That makes incremental ingest
  * ([[append]]) pure segment writes + one manifest commit: no
  * compact-and-rewrite, no read-modify-write races, and
  * append-then-search is bit-identical to a fresh build over the union
  * (Bm25IndexSpec pins it).
  *
  * Search ≡ [[Retrieval.bm25Search]]/[[Retrieval.bm25SearchAll]]
  * bit-for-bit: df per term is the global document frequency (equal to
  * the per-call `tfq` re-count — both count docs containing the term),
  * n_docs/sum_dl reproduce `docs.count()`/`sum(dl)` exactly, and the
  * scoring arithmetic is the same 12-dp DECIMAL contribution sum
  * rounded to 6 dp with (score DESC, id ASC) ties. Bm25IndexSpec pins
  * the equivalence and that a search never touches the documents table.
  */
object Bm25Index {

  private val Frames = Seq("tf", "dl", "df", "meta", "tombstones")

  private def latest(spark: SparkSession, dir: String)
      : Option[(Long, Map[String, Seq[String]])] =
    IndexManifests.latest(spark, dir)

  private def latestFull(spark: SparkSession, dir: String) =
    IndexManifests.latestFull(spark, dir)

  private def requireLatest(spark: SparkSession, dir: String)
      : (Long, Map[String, Seq[String]]) =
    IndexManifests.requireLatest(spark, dir, "BM25")

  private def requireLatestFull(spark: SparkSession, dir: String)
      : (Long, Map[String, Seq[String]], Map[String, (String, String)]) =
    latestFull(spark, dir).getOrElse(throw new IllegalStateException(
      s"no committed BM25 index at $dir (missing _manifests)"))

  private def commit(spark: SparkSession, dir: String, version: Long,
      entries: Map[String, Seq[String]],
      ranges: Map[String, (String, String)] = Map.empty): Unit =
    IndexManifests.commit(spark, dir, version, entries, ranges)

  /** Read one frame as the union of its committed segments; None when
    * the manifest lists no segment for it (e.g. no tombstones yet).
    */
  private def readFrame(spark: SparkSession, dir: String,
      entries: Map[String, Seq[String]], frame: String)
      : Option[DataFrame] = {
    val paths = entries.getOrElse(frame, Nil).map(rel => s"$dir/$rel")
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** [[readFrame]] with MANIFEST-RANGE file pruning (the r15
    * [[SubstrIndex]] discipline applied to the term frames): when the
    * COMPLETE query-term list is known, a segment whose files carry
    * `#range=` term stats contributes only the files whose recorded
    * [min, max] can hold a query term — the rest are never listed into
    * the scan, zero footer opens. Segments committed before range
    * stats existed (or term lists known to be truncated) read whole,
    * conservatively. Terms are driver-side and ≤ 10001 by the callers'
    * guard, so the check is a sorted binary probe per file. A fully
    * pruned frame returns a schema-preserving empty scan (one file,
    * `lit(false)` filter).
    */
  private def readFramePruned(spark: SparkSession, dir: String,
      entries: Map[String, Seq[String]],
      ranges: Map[String, (String, String)], frame: String,
      terms: Option[Seq[String]]): Option[DataFrame] = {
    val segs = entries.getOrElse(frame, Nil)
    if (segs.isEmpty) return None
    val complete = terms.filter(_.size <= 10000)
    if (complete.isEmpty)
      return Some(spark.read.parquet(segs.map(s => s"$dir/$s"): _*))
    val sorted = complete.get.sorted.toIndexedSeq
    def anyTermIn(mn: String, mx: String): Boolean = {
      // first term >= mn, then check it is <= mx
      var lo = 0; var hi = sorted.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (sorted(mid) < mn) lo = mid + 1 else hi = mid
      }
      lo < sorted.size && sorted(lo) <= mx
    }
    val segSet = segs.toSet
    val liveRanged = ranges.toSeq.filter { case (f, _) =>
      val i = f.lastIndexOf('/')
      i > 0 && segSet.contains(f.substring(0, i))
    }
    val rangedSegs = liveRanged.map { case (f, _) =>
      f.substring(0, f.lastIndexOf('/'))
    }.toSet
    val legacy = segs.filterNot(rangedSegs.contains).map(s => s"$dir/$s")
    val kept = liveRanged.collect {
      case (f, rng) if rng == IndexManifests.UnknownFileRange =>
        s"$dir/$f" // stats suppressed: conservatively keep
      case (f, (mn, mx)) if anyTermIn(mn, mx) => s"$dir/$f"
    }
    val paths = kept ++ legacy
    if (paths.nonEmpty) Some(spark.read.parquet(paths: _*))
    else {
      // every file pruned: schema-preserving empty frame (one footer
      // open for the schema; no data read)
      val any = s"$dir/${segs.head}"
      Some(spark.read.parquet(any).filter(lit(false)))
    }
  }

  private def dropOrphanSegments(spark: SparkSession, dir: String,
      live: Map[String, Seq[String]]): Unit =
    IndexManifests.dropOrphanSegments(spark, dir, Frames, live)

  /** Tokenize the corpus once and persist tf/dl/df/meta as one new
    * SEGMENT per frame, then commit the manifest (the crash-atomic
    * point — a failure before it leaves the index exactly as it was).
    * One explode shuffle builds tf; dl, df, and the meta scalars are
    * re-aggregated from it (the raw text is scanned exactly once).
    * `numFiles` sets the term-range file count of the tf segment —
    * size it so each file is ~128 MB at the target corpus (the usual
    * parquet scan sweet spot). `SaveMode.Overwrite` (the default)
    * commits a manifest naming ONLY the new segments and physically
    * drops the superseded ones; `SaveMode.Append` is [[append]].
    */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
      numFiles: Int = 8, mode: SaveMode = SaveMode.Overwrite,
      txn: Option[(String, Long)] = None): Unit = {
    require(mode == SaveMode.Overwrite || mode == SaveMode.Append,
      s"build supports Overwrite|Append, got $mode")
    val spark = docs.sparkSession
    import spark.implicits._
    val prevFull = latestFull(spark, dir)
    val prev = prevFull.map { case (v, e, _) => (v, e) }
    val prevRanges = prevFull.map(_._3)
      .getOrElse(Map.empty[String, (String, String)])
    // EXACTLY-ONCE for streaming ingest (r13 verdict #2): a replayed
    // micro-batch whose batchId is already in the manifest's applied-
    // batch ledger no-ops before any tokenization or write — see
    // [[IndexManifests.txnApplied]]
    if (txn.exists { case (sid, b) => IndexManifests.txnApplied(
        prev.map(_._2).getOrElse(Map.empty), sid, b) }) return
    // Append EXTENDS the committed index: on a dir that HOLDS SEGMENT
    // DATA but no manifest (a pre-manifest legacy layout), prev=None
    // would yield base=empty and commit a manifest naming ONLY the new
    // segments — the existing corpus silently disappears from every
    // search (files left on disk but invisible). Fail loudly there,
    // the same requireLatest discipline as delete/compact; initialize
    // legacy layouts with SaveMode.Overwrite. An EMPTY/nonexistent dir
    // is different: appending there BOOTSTRAPS a fresh index (the
    // streaming-ingest first batch — nothing exists to vanish).
    if (mode == SaveMode.Append && prev.isEmpty) {
      val (fs, _) = IndexManifests.fsOf(spark, dir)
      val legacyData = Frames.exists { f =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$f")
        fs.exists(p) && fs.listStatus(p).nonEmpty
      }
      if (legacyData) requireLatest(spark, dir): Unit
    }
    val prevV = prev.map(_._1).getOrElse(0L)
    val base: Map[String, Seq[String]] =
      if (mode == SaveMode.Append) prev.map(_._2).getOrElse(Map.empty)
      else Map.empty
    val v = prevV + 1
    val seg = f"seg-$v%09d"
    val tf = docs.select(col(idCol).as("id"),
        explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    // house cache rule: tf feeds four consumers (tf/, dl/, df/, meta);
    // materialize once, release before returning
    try {
      Layout.writeClustered(tf, s"$dir/tf/$seg",
        Seq(col("term"), col("id")), numFiles)
      // dl is id-CLUSTERED over numFiles/4 files, not a single-task
      // funnel: a build/compact dl frame is CORPUS-wide (one row per
      // doc), and repartition(1) pushed 100 TB's worth of doc
      // lengths through one writer (r16; readers join dl keyed on
      // the scored rows, so the file count is invisible to them)
      Layout.writeClustered(
        tf.groupBy(col("id")).agg(sum(col("tf")).as("dl")),
        s"$dir/dl/$seg", Seq(col("id")), math.max(1, numFiles / 4))
      Layout.writeClustered(
        tf.groupBy(col("term")).agg(count(lit(1)).as("df")),
        s"$dir/df/$seg", Seq(col("term")), math.max(1, numFiles / 4))
      // n_docs is the CORPUS row count (docs with zero tokens included
      // — bm25Search counts them too); sum_dl re-aggregates tf
      val nDocs = docs.count()
      val sumDl = tf.agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
      Seq((nDocs, sumDl)).toDF("n_docs", "sum_dl")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/meta/$seg")
    } finally tf.unpersist(blocking = false): Unit
    val entries = Seq("tf", "dl", "df", "meta").map { f =>
      f -> (base.getOrElse(f, Nil) :+ s"$f/$seg")
    }.toMap ++
      // tombstones + the txn ledger carry across appends; an
      // overwrite starts clean
      base.get("tombstones").map("tombstones" -> _).toMap ++
      base.get(IndexManifests.TxnFrame)
        .map(IndexManifests.TxnFrame -> _).toMap
    // per-file term ranges of the new tf/df segments ride the commit
    // (the r15 SubstrIndex discipline): searches prune file lists from
    // the manifest alone, zero footer opens on the serving path.
    // Appends carry the surviving files' stats forward; an overwrite
    // starts clean with its own.
    val segRanges =
      IndexManifests.fileRangeStats(spark, dir, s"tf/$seg", "term") ++
        IndexManifests.fileRangeStats(spark, dir, s"df/$seg", "term")
    val ranges =
      (if (mode == SaveMode.Append) prevRanges
       else Map.empty[String, (String, String)]) ++ segRanges
    commit(spark, dir, v,
      txn.fold(entries) { case (sid, b) =>
        IndexManifests.withTxn(entries, sid, b) }, ranges)
    if (mode == SaveMode.Overwrite && prev.nonEmpty)
      dropOrphanSegments(spark, dir, entries)
  }

  /** Incrementally ingest a NEW batch of documents into a persisted
    * index — the sparse mirror of [[AnnIndex.appendIvfPq]]: one batch
    * tokenization, four new SEGMENTS (tf/dl rows, partial df counts,
    * one partial meta row), ONE manifest commit; the existing corpus
    * is never re-tokenized or rewritten, and searches see the whole
    * append or none of it. Appended tf segments are range-clustered
    * over the batch's own term ranges, so footer pruning keeps working
    * per segment. Caller owns id-uniqueness across batches (the same
    * contract as every keyed table here); searching after N appends is
    * bit-identical to one build over the union.
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      dir: String, numFiles: Int = 8,
      txn: Option[(String, Long)] = None,
      autoCompactFanout: Int = 0): Unit = {
    build(docs, idCol, textCol, dir, numFiles, SaveMode.Append, txn)
    // ingest-side maintenance guard (r14 verdict #5, re-policied per
    // r15 verdict #1): SIZE-TIERED minor merge when a tf size tier
    // fills — work bounded by the tier, never the index; the ledger
    // carries through, so replay safety is unchanged
    if (autoCompactFanout > 0)
      compactTier(docs.sparkSession, dir, autoCompactFanout): Unit
  }

  /** SIZE-TIERED minor compaction (r15 verdict #1 — the
    * [[SubstrIndex.compactTier]] policy on the four-frame BM25
    * layout): pick the first full size tier of TF segments
    * ([[IndexManifests.pickTier]]) and structurally merge them —
    * together with the SAME-VERSION dl/df/meta segments (every
    * build/append commits the four under one seg-N) — into one
    * tier-up segment per frame: tf/dl rows re-clustered plain, df
    * partials summed WITHIN the tier (still partial vs the unpicked
    * segments — readers sum across segments either way), meta
    * partials summed likewise. Tombstones are NOT applied (their
    * df/meta corrections stay deferred to the major [[compact]],
    * which owns the id-keyed correction pass), so searches are
    * bit-identical before and after. Per-trigger work is bounded by
    * the tier's bytes, never the index; ledger and tombstones carry.
    * Returns true when a tier merged.
    */
  def compactTier(spark: SparkSession, dir: String, fanout: Int = 8,
      retainVersions: Int = 1): Boolean = {
    import spark.implicits._
    val (v0, entries, ranges) = requireLatestFull(spark, dir)
    val tfSegs = entries.getOrElse("tf", Nil)
    val sizes = IndexManifests.segmentBytes(spark, dir, tfSegs)
    val pickedTf = IndexManifests.pickTier(sizes, fanout)
    if (pickedTf.isEmpty) return false
    // tf/seg-N → the same version's dl/df/meta segments
    val versionsPicked = pickedTf.map(_.stripPrefix("tf/"))
    def pickedOf(frame: String): Seq[String] = {
      val live = entries.getOrElse(frame, Nil).toSet
      versionsPicked.map(v => s"$frame/$v").filter(live.contains)
    }
    val companions = Seq("dl", "df", "meta").flatMap(pickedOf)
    val pickedAll = (pickedTf ++ companions).toSet
    // size the tier-up file count from EVERYTHING this merge rewrites
    // — tf plus the same-version dl/df/meta companions (sizes covers
    // tf only; the companions need their own stat pass)
    val bytes = sizes.collect { case (s, b) if pickedAll(s) => b }.sum +
      IndexManifests.segmentBytes(spark, dir, companions).map(_._2).sum
    val nf = IndexManifests.tierFileCount(bytes)
    val v = v0 + 1
    val seg = f"seg-$v%09d"
    def readPicked(frame: String): Option[DataFrame] = {
      val p = pickedOf(frame)
      if (p.isEmpty) None
      else Some(spark.read.parquet(p.map(s => s"$dir/$s"): _*))
    }
    Layout.writeClustered(
      spark.read.parquet(pickedTf.map(s => s"$dir/$s"): _*),
      s"$dir/tf/$seg", Seq(col("term"), col("id")), nf)
    readPicked("dl").foreach(d => Layout.writeClustered(d,
      s"$dir/dl/$seg", Seq(col("id")), math.max(1, nf / 4)))
    readPicked("df").foreach(d => Layout.writeClustered(
      d.groupBy(col("term")).agg(sum(col("df")).as("df")),
      s"$dir/df/$seg", Seq(col("term")), math.max(1, nf / 4)))
    readPicked("meta").foreach { m =>
      val r = m.agg(coalesce(sum("n_docs"), lit(0L)),
        coalesce(sum("sum_dl"), lit(0L))).head()
      Seq((r.getLong(0), r.getLong(1))).toDF("n_docs", "sum_dl")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/meta/$seg")
    }
    val fresh = entries ++ Seq("tf", "dl", "df", "meta").map { f =>
      val merged =
        if (f == "tf" || pickedOf(f).nonEmpty) Seq(s"$f/$seg") else Nil
      f -> (entries.getOrElse(f, Nil).filterNot(pickedAll) ++ merged)
    }.toMap
    val segRanges =
      IndexManifests.fileRangeStats(spark, dir, s"tf/$seg", "term") ++
        (if (pickedOf("df").isEmpty) Map.empty
         else IndexManifests.fileRangeStats(spark, dir, s"df/$seg",
           "term"))
    val keptRanges = IndexManifests.dropRangesUnder(ranges, pickedAll)
    commit(spark, dir, v, fresh, keptRanges ++ segRanges)
    IndexManifests.vacuum(spark, dir, Frames,
      keepVersions = retainVersions)
    true
  }

  private def readTombstones(spark: SparkSession, dir: String,
      entries: Map[String, Seq[String]]): Option[DataFrame] =
    readFrame(spark, dir, entries, "tombstones")

  /** Delete documents from the index — the takedown mirror of
    * [[graft.extra.Merge.delete]] for the sparse arm, LSM-style (the
    * Lucene precedent: deletes are cheap markers, merges make them
    * physical):
    *
    *   - the ids land in a new `tombstones/` segment + one manifest
    *     commit (O(batch) — the posting lists are NOT rewritten);
    *   - every search anti-joins its candidate rows against the
    *     tombstones, so deleted docs stop matching IMMEDIATELY and
    *     lower-ranked docs fill the top-k;
    *   - `n_docs`/`sum_dl` stay EXACT: each tombstone row carries its
    *     doc's meta contribution (dl presence + value), and every
    *     reader nets meta against the tombstone frame — one committed
    *     segment, no second write to crash between;
    *   - per-term df stays STALE until [[compact]] (correcting it needs
    *     the deleted docs' term lists, i.e. an id-keyed pass over the
    *     term-clustered tf — exactly the scan LSM engines defer to the
    *     merge; Lucene's docFreq ignores deletes the same way). Scores
    *     of surviving docs can therefore differ slightly from a fresh
    *     build until compaction; membership never does.
    *
    * Ids absent from the index are tombstoned harmlessly; re-deleting
    * an id is a no-op (meta is never double-subtracted). Re-ADDING a
    * tombstoned id via [[append]] requires a [[compact]] first — the
    * tombstone would otherwise suppress the new rows too (caller
    * contract, same id-uniqueness ownership as append). Caveat: a
    * zero-token doc has no dl row, so deleting one leaves it inside
    * n_docs until a full rebuild — it never matches a term either way.
    *
    * Returns the number of newly tombstoned ids.
    */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String = "id"): Long = {
    val (v0, entries, ranges) = requireLatestFull(spark, dir)
    val incoming = ids.select(col(idCol).as("id")).distinct()
    val newIds = readTombstones(spark, dir, entries)
      .fold(incoming)(t =>
        incoming.join(t.select("id"), Seq("id"), "left_anti"))
      .persist()
    try {
      val nNew = newIds.count()
      if (nNew == 0) return 0L
      val v = v0 + 1
      val seg = f"seg-$v%09d"
      // ONE atomic commit: each tombstone CARRIES its doc's meta
      // contribution (n = had a dl row, s = its dl), and readers net
      // n_docs/sum_dl out of the tombstone frame itself — a separate
      // negative-meta write (the first design) left a crash window
      // between two appends in which a retried delete would
      // double-subtract meta
      val dl = readFrame(spark, dir, entries, "dl").get
      newIds
        .join(dl, Seq("id"), "left_outer")
        .select(col("id"),
          when(col("dl").isNotNull, lit(1L)).otherwise(lit(0L)).as("n"),
          coalesce(col("dl"), lit(0L)).as("s"))
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/tombstones/$seg")
      commit(spark, dir, v, entries +
        ("tombstones" -> (entries.getOrElse("tombstones", Nil) :+
          s"tombstones/$seg")), ranges)
      nNew
    } finally newIds.unpersist(blocking = false): Unit
  }

  /** Net (n_docs, sum_dl): the meta partials minus the tombstoned
    * docs' carried contributions — every reader's one source of truth
    * for the scoring scalars.
    */
  private def netMeta(spark: SparkSession, dir: String,
      entries: Map[String, Seq[String]]): (Long, Long) =
    // memoized per committed snapshot ([[IndexManifests
    // .cachedByEntries]] — the meta/tombstones segment LISTS are the
    // key, so any append/compact/delete misses): un-memoized, every
    // search call paid a Spark job re-summing partials that cannot
    // have changed under an unchanged manifest
    IndexManifests.cachedByEntries(spark, dir, Seq("meta", "tombstones"),
        entries) {
      val m = readFrame(spark, dir, entries, "meta").get
        .agg(coalesce(sum("n_docs"), lit(0L)).as("n"),
          coalesce(sum("sum_dl"), lit(0L)).as("s")).head()
      val (tn, ts) = readTombstones(spark, dir, entries).map { t =>
        val r = t.agg(coalesce(sum("n"), lit(0L)).as("n"),
          coalesce(sum("s"), lit(0L)).as("s")).head()
        (r.getLong(0), r.getLong(1))
      }.getOrElse((0L, 0L))
      (m.getLong(0) - tn, m.getLong(1) - ts)
    }

  /** Periodic maintenance for an appended index (the LSM compaction
    * half of the append story, same precedent as
    * [[graft.streaming.StreamingPipeline.materializeServing]]): each
    * append adds segments; compaction rewrites the four frames into
    * ONE fresh segment each — tf re-range-clustered across the FULL
    * term space (file pruning sharpens back up), df/meta partials
    * merged to final counts, dl re-sorted, tombstones made physical
    * (tf/dl rows dropped and the deferred per-term df correction
    * applied — the one id-keyed pass over the term-clustered tf, paid
    * at merge time as in any LSM engine). Searches before and after
    * are bit-identical (spec-pinned); run it on the cadence appends
    * accumulate. The new manifest commits BEFORE the superseded
    * segments are physically dropped, so the swap itself is atomic;
    * with the default `retainVersions = 1` the maintenance job owns
    * exclusivity against concurrent readers of OLDER versions during
    * the drop, while `retainVersions >= 2` leaves those readers a
    * physical retention window (reclaim later with
    * [[IndexManifests.vacuum]] — the [[AnnIndex.compact]] contract,
    * shared through the manifest layer).
    */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 8,
      retainVersions: Int = 1): Unit = {
    import spark.implicits._
    val (v0, entries) = requireLatest(spark, dir)
    val v = v0 + 1
    val seg = f"seg-$v%09d"
    val tomb = readTombstones(spark, dir, entries)
    val tf0 = readFrame(spark, dir, entries, "tf").get
    val (tfKept, dfCorr) = tomb match {
      case None => (tf0, None)
      case Some(t) =>
        val corr = tf0.join(t.select("id"), Seq("id")).groupBy(col("term"))
          .agg(count(lit(1)).as("__dfdel"))
        (tf0.join(t.select("id"), Seq("id"), "left_anti"), Some(corr))
    }
    Layout.writeClustered(tfKept, s"$dir/tf/$seg",
      Seq(col("term"), col("id")), numFiles)
    val dl0 = readFrame(spark, dir, entries, "dl").get
    val dlKept =
      tomb.fold(dl0)(t => dl0.join(t.select("id"), Seq("id"), "left_anti"))
    // id-clustered multi-file, as in build — the corpus-wide dl
    // frame never funnels through one task
    Layout.writeClustered(dlKept, s"$dir/dl/$seg", Seq(col("id")),
      math.max(1, numFiles / 4))
    val dfSummed = readFrame(spark, dir, entries, "df").get
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val dfFinal = dfCorr match {
      case None => dfSummed
      case Some(corr) => dfSummed
        .join(corr, Seq("term"), "left_outer")
        .withColumn("df", col("df") - coalesce(col("__dfdel"), lit(0L)))
        .drop("__dfdel")
        .filter(col("df") > 0)
    }
    Layout.writeClustered(dfFinal,
      s"$dir/df/$seg", Seq(col("term")), math.max(1, numFiles / 4))
    // net of the tombstones' carried contributions — the tombstone
    // segments are dropped by the new manifest, so their correction
    // bakes in here
    val (mN, mS) = netMeta(spark, dir, entries)
    Seq((mN, mS)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/meta/$seg")
    // the applied-batch ledger survives maintenance (see
    // [[AnnIndex.compact]]'s matching carry-forward)
    val fresh = Seq("tf", "dl", "df", "meta").map(f => f -> Seq(s"$f/$seg"))
      .toMap ++
      entries.get(IndexManifests.TxnFrame)
        .map(IndexManifests.TxnFrame -> _).toMap
    // fresh per-file term stats for the merged segments — pruning
    // sharpens back up across the full term space with the layout
    val freshRanges =
      IndexManifests.fileRangeStats(spark, dir, s"tf/$seg", "term") ++
        IndexManifests.fileRangeStats(spark, dir, s"df/$seg", "term")
    commit(spark, dir, v, fresh, freshRanges)
    // retention window for readers pinned to recent versions — the
    // [[AnnIndex.compact]] contract shared through the manifest layer;
    // the default 1 keeps the immediate drop
    IndexManifests.vacuum(spark, dir, Frames,
      keepVersions = retainVersions)
  }

  /** Multi-query search over a persisted index: identical semantics and
    * arithmetic to [[Retrieval.bm25SearchAll]], but the corpus never
    * appears — tf is read term-pruned from the index layout, df/idf is
    * read (not re-counted) and broadcast, and the only driver value is
    * the one-row-per-segment meta read. The manifest is resolved ONCE
    * here, so the whole plan reads one committed version (snapshot
    * isolation against concurrent appends). Output: queryIdCol, idCol,
    * `n_hits`, `score` — topK rows per query.
    *
    * `maxDfRatio` is the production STOP-TERM knob (Lucene-family
    * common-terms handling): a query term present in more than that
    * fraction of the corpus contributes ~nothing to ranking (shifted
    * idf ≈ ln(1+ε)) yet drags df(term) ≈ N rows through the scan, the
    * per-query fan-out join, and the per-(query, doc) aggregation — at
    * 1M synthetic docs the 8 universal stopwords alone blew a 200-term
    * search to 20M aggregated rows and ~25 s (Profile `bm25idx`).
    * Pruning happens at the df frame (read FIRST, |query| rows), so
    * dropped terms never reach the tf scan at all. Default 1.0 = off —
    * bit-parity with [[Retrieval.bm25SearchAll]] preserved. When on:
    * searching "q₁ … qₙ" ≡ the default search of the query with its
    * high-df terms removed (docs matching ONLY dropped terms don't
    * appear; `n_hits` counts kept-term matches) — Bm25IndexSpec pins
    * that equivalence exactly.
    */
  def searchAll(spark: SparkSession, dir: String, queries: DataFrame,
      queryIdCol: String, queryTextCol: String, idCol: String = "id",
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20,
      maxDfRatio: Double = 1.0): DataFrame = {
    require(maxDfRatio > 0.0 && maxDfRatio <= 1.0,
      s"maxDfRatio must be in (0, 1], got $maxDfRatio")
    import spark.implicits._
    // ONE manifest resolution for the whole call — the snapshot
    val (_, entries, fileRanges) = requireLatestFull(spark, dir)
    // meta rows are per-build/append partials (log-structured layout),
    // net of tombstoned docs' carried contributions
    val (nDocs, sumDl) = netMeta(spark, dir, entries)
    val avgdl = sumDl.toDouble / nDocs.toDouble

    val qterms = queries.select(col(queryIdCol),
        explode(Text.tokens(col(queryTextCol))).as("term"))
      .distinct()
    // Term-pruned posting read. A broadcast equijoin alone restricts
    // ROWS but pushes nothing into the scan — the first cut of this
    // path read the whole tf table and filtered after decode (measured
    // at 1M docs / 28M tf rows: the full scan dominated the search
    // wall). Queries are FEW by construction (the same constant-size
    // precedent as searchIvfPq's driver-side probe lists), so the
    // distinct query terms are collected and shipped back as a STATIC
    // `term IN (…)` predicate: parquet pushes it to row groups and —
    // against the range-clustered layout — skips whole files on footer
    // min/max. The guard keeps a runaway query frame from building a
    // million-literal filter; past it, the broadcast join still bounds
    // the rows (correctness never depends on the pushdown).
    val termSeq = qterms.select("term").distinct()
      .limit(10001).as[String].collect().toSeq
    def inPruned(df0: DataFrame, ts: Seq[String]): DataFrame =
      if (ts.isEmpty) df0.filter(lit(false)) // all-stop query → no hits
      else if (ts.size <= 10000) df0.filter(col("term").isin(ts: _*))
      else df0
    // df first: |query|-bounded rows, and the stop-term cut (if any)
    // happens HERE, before the tf scan ever sees the terms. The sum
    // merges per-append partial counts (and is a no-op on one build).
    // The frame reads are MANIFEST-RANGE pruned: files whose recorded
    // term range can hold no query term never enter the scan (the
    // `term IN` pushdown then skips row groups within the survivors) —
    // a truncated term list (>10000) disables both, conservatively.
    def framePruned(frame: String, ts: Seq[String]) =
      readFramePruned(spark, dir, entries, fileRanges, frame,
        Some(ts).filter(_.size <= 10000)).get
    val dfRead = inPruned(framePruned("df", termSeq), termSeq)
      .join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val dfKept =
      if (maxDfRatio >= 1.0) dfRead
      else dfRead.filter(
        col("df") <= lit((maxDfRatio * nDocs.toDouble).toLong))
    val keptSeq =
      if (maxDfRatio >= 1.0) termSeq
      else dfKept.select("term").as[String].collect().toSeq
    val tfq = inPruned(framePruned("tf", keptSeq), keptSeq)
      .join(broadcast(dfKept.select("term")), "term")
    val idf = dfKept
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))

    val tfD = col("tf").cast("double")
    val contrib = round(
      col("idf") * ((tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / lit(avgdl))))),
      12).cast(DecimalType(30, 12))

    // tombstoned docs drop out of the candidates here — before the
    // rank window, so lower-ranked survivors fill the top-k (see
    // delete(): membership is exact immediately, df exact after compact)
    val tfLive = readTombstones(spark, dir, entries)
      .fold(tfq)(t => tfq.join(t.select("id"), Seq("id"), "left_anti"))
    val scored = tfLive
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(idf.select("term", "idf")), Seq("term"))
      .join(readFrame(spark, dir, entries, "dl").get, Seq("id"))
      .groupBy(col(queryIdCol), col("id"))
      .agg(count(lit(1)).as("n_hits"),
        round(sum(contrib).cast("double"), 6).as("score"))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= topK)
      .drop("__rank")
      .withColumnRenamed("id", idCol)
  }

  /** Single-query search — [[Retrieval.bm25Search]] over the persisted
    * layout: same output shape (idCol, `n_hits`, `score`), same total
    * (score DESC, id ASC) order, topK rows. Same one-manifest snapshot
    * discipline as [[searchAll]].
    */
  def search(spark: SparkSession, dir: String, queryTerms: Seq[String],
      idCol: String = "id", k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20, maxDfRatio: Double = 1.0): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(maxDfRatio > 0.0 && maxDfRatio <= 1.0,
      s"maxDfRatio must be in (0, 1], got $maxDfRatio")
    import spark.implicits._
    val (_, entries, fileRanges) = requireLatestFull(spark, dir)
    val terms0 = queryTerms.map(_.toLowerCase).distinct
    // meta/df partials aggregate at read (log-structured layout), net
    // of tombstoned docs' carried contributions
    val (nDocs, sumDl) = netMeta(spark, dir, entries)
    val avgdl = sumDl.toDouble / nDocs.toDouble
    // frame reads are manifest-range pruned (see searchAll)
    def framePruned(frame: String, ts: Seq[String]) =
      readFramePruned(spark, dir, entries, fileRanges, frame,
        Some(ts)).get
    def dfSlice(ts: Seq[String]) = framePruned("df", ts)
      .filter(col("term").isin(ts: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    // the term list is already driver-side: static IN predicates push
    // straight to the parquet scans (file skip on the range-clustered
    // layout's footer stats — see searchAll's pushdown note); the
    // stop-term cut (searchAll scaladoc) reads the |query|-row df
    // slice first so dropped terms never reach the tf scan
    val terms =
      if (maxDfRatio >= 1.0) terms0
      else dfSlice(terms0)
        .filter(col("df") <= lit((maxDfRatio * nDocs.toDouble).toLong))
        .select("term").as[String].collect().toSeq
    if (terms.isEmpty) // every query term was stop-cut → no hits
      return readFrame(spark, dir, entries, "dl").get.filter(lit(false))
        .select(col("id").as(idCol), lit(0L).as("n_hits"),
          lit(0.0).as("score")) // id keeps the corpus key's real type
    val tfq0 = framePruned("tf", terms)
      .filter(col("term").isin(terms: _*))
    // tombstone anti-join — see searchAll; bounded by the term-pruned
    // candidate rows, not the corpus
    val tfq = readTombstones(spark, dir, entries)
      .fold(tfq0)(t => tfq0.join(t.select("id"), Seq("id"), "left_anti"))
    val idf = dfSlice(terms)
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
    val tfD = col("tf").cast("double")
    val contrib = round(
      col("idf") * ((tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / lit(avgdl))))),
      12).cast(DecimalType(30, 12))
    tfq.join(broadcast(idf.select("term", "idf")), "term")
      .join(readFrame(spark, dir, entries, "dl").get, "id")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"),
        round(sum(contrib).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
      .withColumnRenamed("id", idCol)
  }
}
