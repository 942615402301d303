package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CyclicBarrier
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The put-if-absent commit primitive under every version CAS.
  * Hadoop's local `create(dst, overwrite = false)` is check-then-act
  * (measured on this box: 1936/2000 barrier-synchronized races ended
  * with TWO successful creates), so these arms pin the replacement:
  * exactly one winner under a synchronized race, loser sees
  * FileAlreadyExistsException, winner's bytes land intact, and no
  * temp debris survives.
  */
class AtomicFilesSpec extends AnyFunSuite {

  private val fs: FileSystem = FileSystem.getLocal(new Configuration())

  test("barrier-synchronized racers: exactly one winner per target, " +
      "every loss is FileAlreadyExistsException, content never torn") {
    val dir = Files.createTempDirectory("atomic-cas")
    var wonTotal = 0
    for (i <- 0 until 200) {
      val dst = new Path(s"$dir/v$i")
      val barrier = new CyclicBarrier(4)
      val wins = new AtomicInteger
      val unexpected =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 4).map { w =>
        new Thread(() => {
          barrier.await()
          try {
            graft.extra.AtomicFiles.createExclusive(fs, dst,
              s"writer-$w".getBytes("UTF-8"))
            wins.incrementAndGet(): Unit
          } catch {
            case _: FileAlreadyExistsException => ()
            case t: Throwable => unexpected.add(t): Unit
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(60000))
      assert(unexpected.isEmpty,
        s"non-CAS failure: ${unexpected.peek()}")
      assert(wins.get() == 1, s"round $i: ${wins.get()} winners")
      wonTotal += wins.get()
      // full winner content, never empty/torn/mixed
      val got = new String(
        Files.readAllBytes(Paths.get(s"$dir/v$i")), "UTF-8")
      assert(got.matches("writer-[0-3]"), s"torn content: '$got'")
    }
    assert(wonTotal == 200)
    // no .tmp- staging debris left behind by losers
    val debris = Files.list(dir).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (debris.hasNext) names += debris.next().getFileName.toString
    assert(!names.exists(_.startsWith(".tmp-")),
      s"staging debris: ${names.filter(_.startsWith(".tmp-"))}")
  }

  test("sequential second create loses; first content is preserved") {
    val dir = Files.createTempDirectory("atomic-seq")
    val dst = new Path(s"$dir/v1")
    graft.extra.AtomicFiles.createExclusive(fs, dst, "first")
    intercept[FileAlreadyExistsException] {
      graft.extra.AtomicFiles.createExclusive(fs, dst, "second")
    }
    assert(new String(Files.readAllBytes(
      Paths.get(s"$dir/v1")), "UTF-8") == "first")
  }

  test("generic-scheme fallback stages then renames (ADVICE r13): a " +
      "commit publishes full content, a second commit loses, and no " +
      "staging debris survives") {
    // a RawLocal-backed FS under an unknown scheme exercises the
    // generic (non-file, non-hdfs, non-object-store) dispatch arm
    val conf = new Configuration()
    conf.set("fs.mockfs.impl", classOf[MockSchemeFs].getName)
    val mfs = FileSystem.get(java.net.URI.create("mockfs:///"), conf)
    val dir = Files.createTempDirectory("atomic-generic")
    val dst = new Path(s"mockfs://$dir/v1")
    graft.extra.AtomicFiles.createExclusive(mfs, dst, "generic-first")
    assert(new String(Files.readAllBytes(
      Paths.get(s"$dir/v1")), "UTF-8") == "generic-first")
    intercept[FileAlreadyExistsException] {
      graft.extra.AtomicFiles.createExclusive(mfs, dst, "generic-second")
    }
    assert(new String(Files.readAllBytes(
      Paths.get(s"$dir/v1")), "UTF-8") == "generic-first")
    val names = {
      val it = Files.list(dir).iterator()
      val b = new scala.collection.mutable.ArrayBuffer[String]
      while (it.hasNext) b += it.next().getFileName.toString
      b
    }
    assert(!names.exists(_.startsWith(".tmp-")),
      s"staging debris: ${names.filter(_.startsWith(".tmp-"))}")
  }
}

/** RawLocalFileSystem re-rooted under a synthetic scheme so specs can
  * drive [[graft.extra.AtomicFiles]]' generic-scheme dispatch arm.
  */
class MockSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}
