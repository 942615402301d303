package graft.extra

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}

/** Atomic PUT-IF-ABSENT of a small immutable file — the commit
  * primitive under every optimistic version CAS in this library
  * ([[Snapshots]] version files, [[IndexManifests]] index manifests).
  *
  * Why `fs.create(dst, overwrite = false)` alone is NOT that
  * primitive: on HDFS the exclusive create is arbitrated by the
  * namenode and is a true CAS, but Hadoop's LOCAL filesystem
  * implements `overwrite = false` as an exists() check followed by a
  * plain open — check-then-act. Two writers racing the same version
  * file through it BOTH "win" (measured on this box: 1936/2000
  * barrier-synchronized races ended with two successful creates, the
  * second silently truncating the first), which breaks the
  * single-winner-per-version invariant the whole commit protocol
  * rests on. The r13 randomized rebalance-storm race spec caught
  * exactly this as a `version 1 committed twice`.
  *
  * Local-scheme path: write the full content to a hidden same-dir
  * temp file, then publish it with `Files.createLink` — the POSIX
  * link(2) syscall fails atomically with EEXIST when the target
  * already exists, giving both the CAS and full-content atomicity (a
  * reader can never observe a half-written committed file, a gap the
  * direct-create form also had). Filesystems without hard links fall
  * back to `Files.createFile` (O_CREAT|O_EXCL — still a true CAS,
  * atomic reserve) followed by the content write. HDFS stages the
  * content and publishes with namenode-arbitrated rename (atomic,
  * fails on an existing destination — the canonical HDFS commit, and
  * content-atomic where direct create-then-write would let readers
  * see a growing file). Known conditional-PUT object stores (s3a,
  * gs, …) keep `fs.create(dst, false)` — their rename is copy+delete
  * emulation while the create is server-arbitrated. Every OTHER
  * scheme stages and publishes via rename-if-absent, so no reader
  * anywhere can observe a torn committed file.
  *
  * Throws Hadoop's [[FileAlreadyExistsException]] on a lost race —
  * callers map it to their protocol-level
  * `ConcurrentModificationException`.
  */
private[graft] object AtomicFiles {

  def createExclusive(fs: FileSystem, dst: Path,
      bytes: Array[Byte]): Unit = {
    val scheme = Option(dst.toUri.getScheme)
      .getOrElse(fs.getUri.getScheme)
    scheme match {
      case "file" => createExclusiveLocal(dst, bytes)
      // HDFS: rename is arbitrated at the namenode — atomic, and it
      // FAILS (returns false) when the destination exists. Staging
      // the full content first means a reader can never open a
      // half-written committed file, which direct create-then-write
      // would expose (the stream is visible from creation)
      case "hdfs" => createExclusiveViaRename(fs, dst, bytes)
      case s if ObjectStoreSchemes.contains(s) =>
        // conditional-PUT object stores: rename is a non-atomic
        // copy+delete emulation (and slow), while the exclusive
        // create maps to a server-arbitrated conditional PUT that
        // surfaces the conflict on close — the right primitive here
        val out =
          try fs.create(dst, false)
          catch {
            case e: FileAlreadyExistsException => throw e
            // some filesystems signal the existing file with a bare
            // IOException — map to the lost-race path only when the
            // target really exists; genuine I/O failures must surface
            case e: java.io.IOException =>
              if (fs.exists(dst))
                throw new FileAlreadyExistsException(dst.toString)
              else throw e
          }
        try out.write(bytes)
        finally out.close()
      case _ =>
        // any other scheme: stage the full content, publish with
        // rename-if-absent (ADVICE r13: the old direct create-then-
        // write let readers observe a partially written "committed"
        // file). Content atomicity holds on every store whose rename
        // moves the staged object wholesale; the no-replace CAS is as
        // strong as the store's rename arbitration — a true CAS on
        // namenode-arbitrated filesystems, a narrow check-then-act
        // window on stores that don't arbitrate (still strictly
        // better than the torn-readable direct create it replaces)
        createExclusiveViaRenameNone(fs, dst, bytes)
    }
  }

  /** Stores whose rename is copy+delete emulation but whose exclusive
    * create is a server-side conditional PUT (or close-time conflict).
    */
  private val ObjectStoreSchemes =
    Set("s3", "s3a", "s3n", "gs", "oss", "cos", "obs", "swift")

  /** Stage + rename-if-absent for schemes without a known stronger
    * primitive (the three-arg `rename(…, Rename.NONE)` is protected
    * in [[FileSystem]], so its refuse-existing-destination contract
    * is replayed here: exists pre-check, rename, lost-race mapping).
    * The staged write is the load-bearing half — no reader can ever
    * open a half-written committed file, on any store. The no-replace
    * CAS is as strong as the store's rename arbitration: true CAS
    * where rename refuses/fails on an existing destination; on stores
    * whose rename silently REPLACES, the exists pre-check narrows the
    * race and the post-rename READ-BACK closes it (ADVICE r14) — the
    * destination is re-read after publishing and a content mismatch
    * (another writer's rename landed over ours, or ours landed over an
    * already-committed file whose writer re-reads next) surfaces as
    * the same loud [[FileAlreadyExistsException]] callers already map
    * to their protocol conflict. Each rename is whole-file, so even a
    * detected loser leaves a complete, well-formed committed file —
    * never a torn one — and at most one racer can read back its own
    * bytes and report success.
    */
  private def createExclusiveViaRenameNone(fs: FileSystem, dst: Path,
      bytes: Array[Byte]): Unit = {
    val tmp = new Path(dst.getParent,
      s".tmp-${java.util.UUID.randomUUID()}")
    var published = false
    try {
      val out = fs.create(tmp, false)
      try out.write(bytes)
      finally out.close()
      if (fs.exists(dst))
        throw new FileAlreadyExistsException(dst.toString)
      val renamed =
        try fs.rename(tmp, dst)
        catch {
          case _: FileAlreadyExistsException => false
          case _: org.apache.hadoop.fs.PathExistsException => false
        }
      if (!renamed) {
        if (fs.exists(dst))
          throw new FileAlreadyExistsException(dst.toString)
        throw new java.io.IOException(
          s"rename $tmp -> $dst failed without an existing destination")
      }
      // read-back verification: on a silently-replacing rename the
      // "successful" publish may have been clobbered between our
      // rename and now (or clobbered someone — they detect it on
      // their own read-back). Committed files are small by contract
      // (manifest text), so this is one metadata-scale read.
      if (!java.util.Arrays.equals(readFully(fs, dst), bytes))
        throw new FileAlreadyExistsException(
          s"$dst: lost commit race detected on post-rename read-back")
      published = true
    } finally if (!published) fs.delete(tmp, false): Unit
  }

  private def readFully(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      bos.toByteArray
    } finally in.close()
  }

  private def createExclusiveViaRename(fs: FileSystem, dst: Path,
      bytes: Array[Byte]): Unit = {
    val tmp = new Path(dst.getParent,
      s".tmp-${java.util.UUID.randomUUID()}")
    var published = false
    try {
      val out = fs.create(tmp, false)
      try out.write(bytes)
      finally out.close()
      val renamed =
        try fs.rename(tmp, dst)
        catch {
          case _: FileAlreadyExistsException => false
          case _: org.apache.hadoop.fs.PathExistsException => false
        }
      if (!renamed) {
        if (fs.exists(dst))
          throw new FileAlreadyExistsException(dst.toString)
        throw new java.io.IOException(
          s"rename $tmp -> $dst failed without an existing destination")
      }
      published = true
    } finally if (!published) fs.delete(tmp, false): Unit
  }

  def createExclusive(fs: FileSystem, dst: Path, text: String): Unit =
    createExclusive(fs, dst, text.getBytes(StandardCharsets.UTF_8))

  private def createExclusiveLocal(dst: Path,
      bytes: Array[Byte]): Unit = {
    import java.nio.file.{Files, Paths}
    val target = Paths.get(dst.toUri.getPath)
    if (target.getParent != null)
      Files.createDirectories(target.getParent): Unit
    // dot-prefixed temp: invisible to every manifest listing (they
    // match `v*` / `c-*` names) and to vacuum's orphan sweeps
    val tmp = target.resolveSibling(
      s".tmp-${java.util.UUID.randomUUID()}")
    try {
      Files.write(tmp, bytes)
      try Files.createLink(target, tmp): Unit
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new FileAlreadyExistsException(dst.toString)
        case _: UnsupportedOperationException =>
          // no hard links on this FS: O_CREAT|O_EXCL reserve is still
          // an atomic CAS; content lands right after (readers of a
          // just-reserved empty file retry at the protocol level)
          try Files.createFile(target): Unit
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new FileAlreadyExistsException(dst.toString)
          }
          Files.write(target, bytes): Unit
      }
    } finally Files.deleteIfExists(tmp): Unit
  }
}
