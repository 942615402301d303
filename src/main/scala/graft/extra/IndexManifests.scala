package graft.extra

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Manifest-committed versions for the persisted index layouts
  * ([[Bm25Index]], [[AnnIndex]]) — the Lucene commit-point discipline,
  * shared: a manifest file `_manifests/vN.txt` holds one
  * `frame<TAB>segment-relpath` line per live segment, committed by a
  * CREATE-FAILS-IF-EXISTS on the version number (a true CAS even on
  * filesystems whose rename clobbers). Readers resolve the
  * latest committed manifest once per call and plan only against the
  * segments it names, so an in-flight (or crashed) writer's files are
  * invisible until its commit lands — snapshot isolation for
  * multi-file, non-atomic index writes. Single writer at a time is the
  * caller's contract; the CAS turns a writer race into an error, never
  * a clobbered manifest.
  */
private[graft] object IndexManifests {

  def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestDir(dir: String) = s"$dir/_manifests"

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".txt"))
      name.stripPrefix("v").stripSuffix(".txt").toLongOption
    else None

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, md) = fsOf(spark, manifestDir(dir))
    if (!fs.exists(md)) return Nil
    fs.listStatus(md).toSeq
      .flatMap(s => versionOf(s.getPath.getName)).sorted
  }

  private def readManifest(fs: FileSystem, md: Path, v: Long)
      : Map[String, Seq[String]] = {
    val in = fs.open(new Path(md, f"v$v%09d.txt"))
    val txt = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      bos.toString("UTF-8")
    } finally in.close()
    txt.linesIterator.filter(_.nonEmpty).toSeq
      .map { l => val Array(f, seg) = l.split("\t", 2); (f, seg) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  /** Latest committed (version, frame → live segment relpaths). */
  def latest(spark: SparkSession, dir: String)
      : Option[(Long, Map[String, Seq[String]])] = {
    val (fs, md) = fsOf(spark, manifestDir(dir))
    if (!fs.exists(md)) return None
    val vs = fs.listStatus(md).toSeq
      .flatMap(s => versionOf(s.getPath.getName))
    vs.maxOption.map(v => (v, readManifest(fs, md, v)))
  }

  /** The entries of a SPECIFIC committed version — index time travel
    * (manifests are kept until [[vacuum]]'s retention reclaims their
    * segments, so any still-vacuum-safe version is readable).
    */
  def at(spark: SparkSession, dir: String, version: Long)
      : Map[String, Seq[String]] = {
    val (fs, md) = fsOf(spark, manifestDir(dir))
    val p = new Path(md, f"v$version%09d.txt")
    if (!fs.exists(p))
      throw new IllegalArgumentException(
        s"no committed index manifest v$version at $dir " +
          s"(have: ${versions(spark, dir).mkString(",")})")
    readManifest(fs, md, version)
  }

  /** Index ROLLBACK, the [[Snapshots.restore]] discipline applied to
    * the index layer: re-commit `toVersion`'s entries as a NEW head —
    * append-only (versions after `toVersion` still resolve), CAS-
    * arbitrated like every commit, manifest-only cost (segments are
    * shared by reference; no data IO). Guards that every referenced
    * segment still exists physically — a version whose segments a
    * [[vacuum]] already reclaimed cannot be restored. Returns the new
    * head version.
    */
  def restore(spark: SparkSession, dir: String, toVersion: Long): Long = {
    val entries = at(spark, dir, toVersion)
    val (fs, _) = fsOf(spark, dir)
    val missing = entries
      .filter { case (f, _) => !f.startsWith("_") }
      .flatMap { case (_, segs) => segs }
      .filter(seg => !fs.exists(new Path(s"$dir/$seg")))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"cannot restore $dir to v$toVersion: segment(s) " +
          s"${missing.mkString(", ")} were vacuumed")
    val head = latest(spark, dir).map(_._1).getOrElse(0L)
    val v = head + 1
    commit(spark, dir, v, entries)
    v
  }

  /** Physically reclaim segments referenced by NONE of the newest
    * `keepVersions` committed manifests. `keepVersions = 1` is the
    * immediate-drop discipline (only the head's segments survive);
    * larger values give readers pinned to recent versions a retention
    * window to finish against — the snapshot-layer vacuum contract
    * carried over to indexes. Versions older than the window stay
    * listable/restorable only while their segments happen to be shared
    * with a retained version ([[restore]] guards that).
    */
  def vacuum(spark: SparkSession, dir: String, frames: Seq[String],
      keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1,
      s"keepVersions must be >= 1, got $keepVersions")
    val vs = versions(spark, dir)
    if (vs.isEmpty) return
    val (fs, md) = fsOf(spark, manifestDir(dir))
    val live = vs.takeRight(keepVersions)
      .map(v => readManifest(fs, md, v))
      .foldLeft(Map.empty[String, Seq[String]]) { (acc, m) =>
        (acc.keySet ++ m.keySet).map { k =>
          k -> (acc.getOrElse(k, Nil) ++ m.getOrElse(k, Nil)).distinct
        }.toMap
      }
    dropOrphanSegments(spark, dir, frames, live)
  }

  def requireLatest(spark: SparkSession, dir: String, what: String)
      : (Long, Map[String, Seq[String]]) =
    latest(spark, dir).getOrElse(throw new IllegalStateException(
      s"no committed $what index at $dir (missing _manifests)"))

  /** Atomic commit via put-if-absent on the FINAL name (the same
    * commit point as [[Snapshots]]' manifest commit): the exclusive
    * create is the CAS — two writers racing one version both reach
    * it, the loser throws, and the winner's committed bytes are never
    * clobbered. Neither write-aside-then-rename (RawLocalFileSystem's
    * rename replaces an existing destination) nor a bare
    * `fs.create(dst, false)` (check-then-act on the local scheme —
    * see [[AtomicFiles]]) is that primitive everywhere, so the create
    * goes through [[AtomicFiles.createExclusive]].
    */
  def commit(spark: SparkSession, dir: String, version: Long,
      entries: Map[String, Seq[String]]): Unit = {
    val (fs, md) = fsOf(spark, manifestDir(dir))
    fs.mkdirs(md)
    val dst = new Path(md, f"v$version%09d.txt")
    def lostRace() = new java.util.ConcurrentModificationException(
      s"index manifest v$version already committed at $dir — " +
        "concurrent writer (single-writer contract)")
    val bytes = entries.toSeq.sortBy(_._1)
      .flatMap { case (f, segs) => segs.map(s => s"$f\t$s") }
      .mkString("", "\n", "\n").getBytes("UTF-8")
    // AtomicFiles supplies a TRUE put-if-absent: on the local scheme
    // Hadoop's create(dst, false) is check-then-act (two racers can
    // both win, the loser clobbering the committed manifest) — see
    // [[AtomicFiles]] for the measurement
    try AtomicFiles.createExclusive(fs, dst, bytes)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw lostRace()
    }
  }

  /** APPLIED-BATCH LEDGER riding the manifest itself — the exactly-
    * once mechanism for streaming index ingest (r13 verdict #2, the
    * [[graft.streaming.ViewStream]] ledger discipline re-expressed at
    * the index layer): a `_txn` pseudo-frame holds one
    * `streamId:batchId` token per ingesting stream, committed in the
    * SAME atomic manifest write as the segments it covers. A crash-
    * replayed micro-batch finds its (or a later) batchId already
    * recorded and no-ops, so the index never holds duplicate segment
    * rows. `_txn` never touches disk as a frame dir — [[vacuum]] /
    * [[dropOrphanSegments]] iterate physical frames only.
    */
  val TxnFrame = "_txn"

  /** True when `streamId` has already committed `batchId` (or any
    * later batch — the monotone-replay guard: Spark re-runs only
    * not-yet-committed batches, always in order).
    */
  def txnApplied(entries: Map[String, Seq[String]], streamId: String,
      batchId: Long): Boolean =
    entries.getOrElse(TxnFrame, Nil).exists { t =>
      val i = t.lastIndexOf(':')
      i > 0 && t.substring(0, i) == streamId &&
        t.substring(i + 1).toLongOption.exists(_ >= batchId)
    }

  /** Entries with this stream's ledger token replaced by `batchId`
    * (one token per stream — the ledger is O(#streams), not
    * O(#batches)).
    */
  def withTxn(entries: Map[String, Seq[String]], streamId: String,
      batchId: Long): Map[String, Seq[String]] = {
    val kept = entries.getOrElse(TxnFrame, Nil).filter { t =>
      val i = t.lastIndexOf(':')
      !(i > 0 && t.substring(0, i) == streamId)
    }
    entries + (TxnFrame -> (kept :+ s"$streamId:$batchId"))
  }

  /** Delete every on-disk child of the given frame dirs not named by
    * `live` (post-commit physical cleanup — overwrite builds and
    * compaction). A frame dir left with no children is removed too.
    */
  def dropOrphanSegments(spark: SparkSession, dir: String,
      frames: Seq[String], live: Map[String, Seq[String]]): Unit = {
    val (fs, _) = fsOf(spark, dir)
    val keep = live.values.flatten.toSet
    frames.foreach { f =>
      val fd = new Path(s"$dir/$f")
      // a frame listed as its own live segment (the pre-manifest
      // legacy layout adopted wholesale) is kept as-is
      if (fs.exists(fd) && !keep.contains(f)) {
        fs.listStatus(fd).foreach { st =>
          val rel = s"$f/${st.getPath.getName}"
          if (!keep.contains(rel)) fs.delete(st.getPath, true): Unit
        }
        if (fs.listStatus(fd).isEmpty) fs.delete(fd, true): Unit
      }
    }
  }
}
