package graft.extra

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Manifest-committed versions for the persisted index layouts
  * ([[Bm25Index]], [[AnnIndex]]) — the Lucene commit-point discipline,
  * shared: a manifest file `_manifests/vN.txt` holds one
  * `frame<TAB>segment-relpath` line per live segment, committed by
  * ATOMIC RENAME with a CAS on the version number. Readers resolve the
  * latest committed manifest once per call and plan only against the
  * segments it names, so an in-flight (or crashed) writer's files are
  * invisible until its commit lands — snapshot isolation for
  * multi-file, non-atomic index writes. Single writer at a time is the
  * caller's contract; the CAS turns a writer race into an error, never
  * a clobbered manifest.
  */
private[extra] object IndexManifests {

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

  /** Atomic commit: write aside, rename into place. The rename is the
    * commit point; a version collision (two writers racing) surfaces
    * as an exception, never a clobbered manifest.
    */
  def commit(spark: SparkSession, dir: String, version: Long,
      entries: Map[String, Seq[String]]): Unit = {
    val (fs, md) = fsOf(spark, manifestDir(dir))
    fs.mkdirs(md)
    val tmp = new Path(md,
      s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write(entries.toSeq.sortBy(_._1)
      .flatMap { case (f, segs) => segs.map(s => s"$f\t$s") }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(md, f"v$version%09d.txt")
    if (fs.exists(dst) || !fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"index manifest v$version already committed at $dir — " +
          "concurrent writer (single-writer contract)")
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
