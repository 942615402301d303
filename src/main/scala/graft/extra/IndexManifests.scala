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

  /** Latest committed (version, frame → live segment relpaths). */
  def latest(spark: SparkSession, dir: String)
      : Option[(Long, Map[String, Seq[String]])] = {
    val (fs, md) = fsOf(spark, manifestDir(dir))
    if (!fs.exists(md)) return None
    val vs = fs.listStatus(md).toSeq
      .flatMap(s => versionOf(s.getPath.getName))
    vs.maxOption.map { v =>
      val in = fs.open(new Path(md, f"v$v%09d.txt"))
      val txt = try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toString("UTF-8")
      } finally in.close()
      val entries = txt.linesIterator.filter(_.nonEmpty).toSeq
        .map { l => val Array(f, seg) = l.split("\t", 2); (f, seg) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      (v, entries)
    }
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
