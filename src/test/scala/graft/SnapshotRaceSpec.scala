package graft

import java.nio.file.Files
import java.util.ConcurrentModificationException

import org.apache.spark.sql.functions._

import graft.extra.Snapshots

/** Randomized MULTI-WRITER concurrency smoke over one snapshot table
  * (r11 verdict #7): N writer threads race upserts, deletes and
  * compactions (plus a maintenance thread vacuuming behind the head)
  * through the optimistic CAS commit, losers retrying on
  * [[ConcurrentModificationException]]. Invariants asserted at the
  * end, interleaving-independent by construction:
  *
  *   - versions are CONTIGUOUS (every commit won exactly one slot —
  *     no clobbered or skipped version);
  *   - every SURVIVING version reads cleanly with ≤ 1 row per key
  *     (snapshot isolation: no torn commit ever became visible);
  *   - the final table equals a SERIAL REPLAY of the winning commits
  *     in version order (a lost race never leaks its computation into
  *     a committed version).
  *
  * Runs in TREE manifest format (filesPerManifest=4), so the CAS +
  * chunk-carry path is what's being raced.
  */
class SnapshotRaceSpec extends SparkSpec {
  import spark.implicits._

  private sealed trait Op
  private case class Up(rows: Map[Long, String]) extends Op
  private case class Del(keys: Set[Long]) extends Op
  private case object Compacted extends Op

  test("racing writers: contiguous versions, clean reads, final " +
      "state == serial replay of winning commits") {
    spark.conf.set(Snapshots.FilesPerManifestKey, "4")
    try {
      val dir = Files.createTempDirectory("snap-race").toString
      val init = (0L until 200L).map(i => i -> s"base-$i").toMap
      Snapshots.init(
        init.toSeq.toDF("id", "text"), dir, "id", numFiles = 8)

      val committed =
        new java.util.concurrent.ConcurrentHashMap[Long, Op]()
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)

      def retrying(op: => Snapshots.Commit, mk: => Op): Unit = {
        var done = false
        var tries = 0
        while (!done) {
          try {
            val c = op
            val prev = committed.put(c.version, mk)
            assert(prev == null,
              s"version ${c.version} committed twice: $prev vs $mk")
            done = true
          } catch {
            case _: ConcurrentModificationException =>
              tries += 1
              if (tries > 60) throw new IllegalStateException(
                "writer starved after 60 lost races")
              Thread.sleep(20L * (1 + tries % 5))
          }
        }
      }

      val writers = (0 until 3).map { w =>
        new Thread(() => {
          val rnd = new scala.util.Random(1000 + w)
          try {
            for (i <- 0 until 8) {
              rnd.nextInt(5) match {
                case 0 =>
                  val ks = Seq.fill(3)(rnd.nextInt(260).toLong).distinct
                  retrying(
                    Snapshots.delete(spark, dir, ks.toDF("id"), "id"),
                    Del(ks.toSet))
                case 4 if i % 4 == 3 =>
                  retrying(
                    Snapshots.compact(spark, dir, "id",
                      targetFileBytes = 256L * 1024),
                    Compacted)
                case _ =>
                  val rows = Seq.fill(4)(rnd.nextInt(260).toLong)
                    .distinct.map(k => k -> s"w$w-i$i-$k").toMap
                  retrying(
                    Snapshots.upsert(spark, dir,
                      rows.toSeq.toDF("id", "text"), "id"),
                    Up(rows))
              }
            }
          } catch { case t: Throwable => errors.add(t): Unit }
        }, s"race-writer-$w")
      }
      val vacuumer = new Thread(() => {
        val rnd = new scala.util.Random(99)
        try {
          while (!stop.get()) {
            Thread.sleep(150 + rnd.nextInt(100))
            val latest = Snapshots.latestVersion(spark, dir).getOrElse(0L)
            if (latest > 4)
              Snapshots.vacuum(spark, dir, latest - 3,
                orphanGraceMs = 3600 * 1000L): Unit
          }
        } catch { case t: Throwable => errors.add(t): Unit }
      }, "race-vacuum")

      writers.foreach(_.start())
      vacuumer.start()
      writers.foreach(_.join(300000))
      stop.set(true)
      vacuumer.join(30000)
      assert(errors.isEmpty, s"writer/vacuum errors: " +
        errors.toArray.map(_.toString).mkString("; "))

      // contiguous version chain: 24 writer ops → versions 1..24
      import scala.jdk.CollectionConverters._
      val versions = committed.keySet.asScala.toSeq.sorted
      assert(versions == (1L to 24L), s"non-contiguous: $versions")
      assert(Snapshots.latestVersion(spark, dir).contains(24L))

      // every surviving version reads cleanly, keyed-unique
      val floor = versions.filter(v =>
        Files.exists(java.nio.file.Paths.get(dir, "_manifests", s"v$v")))
      assert(floor.nonEmpty)
      floor.foreach { v =>
        val d = Snapshots.read(spark, dir, Some(v))
          .agg(count(lit(1)), count_distinct(col("id"))).head()
        assert(d.getLong(0) == d.getLong(1),
          s"v$v holds duplicate keys")
      }

      // serial replay of the winning commits == final table
      var model = init
      versions.foreach { v =>
        committed.get(v) match {
          case Up(rows) => model = model ++ rows
          case Del(ks) => model = model -- ks
          case Compacted => ()
        }
      }
      val got = Snapshots.read(spark, dir).select("id", "text")
        .as[(Long, String)].collect().toMap
      assert(got == model,
        s"divergence: ${(got.toSet diff model.toSet).take(5)} / " +
          s"${(model.toSet diff got.toSet).take(5)}")
    } finally spark.conf.unset(Snapshots.FilesPerManifestKey)
  }

  /** Rebalance-under-contention arm (r12 verdict #5): a commit STORM
    * of tiny appends from racing writers drives the chunk-ref list
    * across the 4×-packed-size guard repeatedly, so the tree's
    * re-pack path (expand every carried chunk, re-pack the whole
    * inventory, all inside the optimistic CAS) is exercised WHILE
    * losing and retrying races — not just serially as in
    * SnapshotTreeSpec. Asserts the usual isolation invariants plus
    * that at least one committed version actually re-packed (its ref
    * count collapses vs its parent; appends otherwise only ever grow
    * the list by one).
    */
  test("racing tiny-append writers: rebalance re-pack fires inside " +
      "the CAS race and never tears a read") {
    spark.conf.set(Snapshots.FilesPerManifestKey, "8")
    try {
      val dir = Files.createTempDirectory("snap-race-rebal").toString
      val init = (0L until 128L).map(i => i -> s"base-$i").toMap
      Snapshots.init(
        init.toSeq.toDF("id", "text"), dir, "id", numFiles = 16)

      val committed =
        new java.util.concurrent.ConcurrentHashMap[Long, Map[Long, String]]()
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val nPerWriter = 12
      val writers = (0 until 3).map { w =>
        new Thread(() => {
          try {
            for (i <- 0 until nPerWriter) {
              // strictly new keys, disjoint per writer: every commit
              // carries ALL prior chunks untouched and adds one tiny
              // chunk — the exact shape that grows the ref list until
              // the guard re-packs it
              val rows = Map(
                (100000L + w * 10000L + i) -> s"w$w-i$i")
              var done = false
              var tries = 0
              while (!done) {
                try {
                  val c = Snapshots.upsert(spark, dir,
                    rows.toSeq.toDF("id", "text"), "id")
                  val prev = committed.put(c.version, rows)
                  assert(prev == null,
                    s"version ${c.version} committed twice")
                  done = true
                } catch {
                  case _: ConcurrentModificationException =>
                    tries += 1
                    if (tries > 80) throw new IllegalStateException(
                      "writer starved after 80 lost races")
                    Thread.sleep(10L * (1 + tries % 5))
                }
              }
            }
          } catch { case t: Throwable => errors.add(t): Unit }
        }, s"rebal-writer-$w")
      }
      writers.foreach(_.start())
      writers.foreach(_.join(300000))
      assert(errors.isEmpty, s"writer errors: " +
        errors.toArray.map(_.toString).mkString("; "))

      import scala.jdk.CollectionConverters._
      val versions = committed.keySet.asScala.toSeq.sorted
      assert(versions == (1L to (3L * nPerWriter)),
        s"non-contiguous: $versions")

      // ref-count trajectory across the retained chain: appends add
      // at most one ref per commit, so any drop is the guard firing.
      def refCount(v: Long): Int =
        new String(Files.readAllBytes(
          java.nio.file.Paths.get(dir, "_manifests", s"v$v")), "UTF-8")
          .linesIterator.count(_.startsWith("#mchunk="))
      val refCounts = (0L +: versions).map(refCount)
      val drops = refCounts.sliding(2).count(p => p(1) < p.head)
      assert(drops >= 1,
        s"no rebalance fired across ${versions.size} tiny commits: " +
          s"ref trajectory $refCounts")
      // guard invariant holds at the head
      val head = versions.last
      val total = Snapshots.manifest(spark, dir, head).size
      val packed = (total + 7) / 8
      assert(refCounts.last <= math.max(16, 4 * packed),
        s"${refCounts.last} refs for $total files (packed=$packed)")

      // no torn read anywhere on the chain; final state == init plus
      // every winning append
      versions.foreach { v =>
        val d = Snapshots.read(spark, dir, Some(v))
          .agg(count(lit(1)), count_distinct(col("id"))).head()
        assert(d.getLong(0) == d.getLong(1), s"v$v duplicate keys")
      }
      val model = committed.values.asScala.foldLeft(init)(_ ++ _)
      val got = Snapshots.read(spark, dir).select("id", "text")
        .as[(Long, String)].collect().toMap
      assert(got == model,
        s"divergence: ${(got.toSet diff model.toSet).take(5)} / " +
          s"${(model.toSet diff got.toSet).take(5)}")
    } finally spark.conf.unset(Snapshots.FilesPerManifestKey)
  }
}
