package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.extra.Snapshots

/** Snapshot-versioned tables: time travel re-reads exactly, child
  * manifests share cold files by reference, commits are first-wins
  * under a race, and vacuum deletes only what no retained version
  * references.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"snap-$tag").toString

  private def slurp(dir: String): Set[(Long, String)] =
    Snapshots.read(spark, dir).select("id", "text")
      .as[(Long, String)].collect().toSet

  private def slurpAt(dir: String, v: Long): Set[(Long, String)] =
    Snapshots.read(spark, dir, Some(v)).select("id", "text")
      .as[(Long, String)].collect().toSet

  test("init → upsert → delete: every version time-travels exactly; " +
      "cold files are shared by reference") {
    val dir = freshDir("tt")
    val base = spark.range(1000)
      .select(col("id"), concat(lit("doc-"), col("id")).as("text"))
    val c0 = Snapshots.init(base, dir, "id", numFiles = 8)
    assert(c0.version == 0L && c0.files.size == 8)

    val updates = Seq((5L, "doc-5-v2"), (6L, "doc-6-v2"),
      (2000L, "doc-2000")).toDF("id", "text")
    val c1 = Snapshots.upsert(spark, dir, updates, "id")
    assert(c1.version == 1L)
    assert(c1.filesReplaced == 1, c1.toString) // 5,6 in one file range
    // structural sharing: v1 carries 7 of v0's 8 files by reference
    assert(c0.files.toSet.intersect(c1.files.toSet).size == 7)

    val c2 = Snapshots.delete(spark, dir, Seq(5L, 7L).toDF("id"), "id")
    assert(c2.version == 2L)

    val v0 = (0L until 1000L).map(i => (i, s"doc-$i")).toSet
    val v1 = v0 -- Set((5L, "doc-5"), (6L, "doc-6")) ++
      Set((5L, "doc-5-v2"), (6L, "doc-6-v2"), (2000L, "doc-2000"))
    val v2 = v1 -- Set((5L, "doc-5-v2"), (7L, "doc-7"))
    assert(slurpAt(dir, 0) == v0)
    assert(slurpAt(dir, 1) == v1)
    assert(slurpAt(dir, 2) == v2)
    assert(slurp(dir) == v2)

    // data files are immutable across commits: the shared files'
    // bytes at v2 are the ones v0 wrote
    val dataFiles = Files.list(Paths.get(dir, "data")).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    assert(dataFiles.nonEmpty)
  }

  test("restore: rollback is an append-only commit — old versions " +
      "still travel, restored head == target, vacuum keeps shared files") {
    val dir = freshDir("restore")
    val base = spark.range(200)
      .select(col("id"), concat(lit("doc-"), col("id")).as("text"))
    Snapshots.init(base, dir, "id", numFiles = 4): Unit
    Snapshots.upsert(spark, dir,
      Seq((5L, "v1"), (300L, "new")).toDF("id", "text"), "id"): Unit
    Snapshots.delete(spark, dir, Seq(7L).toDF("id"), "id"): Unit

    val v0 = (0L until 200L).map(i => (i, s"doc-$i")).toSet
    val v1 = v0 - ((5L, "doc-5")) + ((5L, "v1")) + ((300L, "new"))
    val v2 = v1 - ((7L, "doc-7"))

    val c = Snapshots.restore(spark, dir, 0L)
    assert(c.version == 3L && c.filesReplaced == 0 && c.rowsWritten == 0L)
    // head serves the restored content; nothing behind it moved
    assert(slurp(dir) == v0)
    assert(slurpAt(dir, 1) == v1)
    assert(slurpAt(dir, 2) == v2)
    assert(slurpAt(dir, 3) == v0)
    // the rollback is itself history: restore the PRE-rollback head
    val c2 = Snapshots.restore(spark, dir, 2L)
    assert(c2.version == 4L)
    assert(slurp(dir) == v2)
    // out-of-range targets rejected
    intercept[IllegalArgumentException] {
      Snapshots.restore(spark, dir, 99L)
    }
    // vacuum to the rollback floor: v0's files survive because the
    // retained v3 references them by name
    Snapshots.restore(spark, dir, 0L): Unit // v5 == v0 content
    Snapshots.vacuum(spark, dir, retainFrom = 5L,
      orphanGraceMs = 3600L * 1000): Unit
    assert(slurp(dir) == v0)
    intercept[Exception] { slurpAt(dir, 1) } // dropped version gone
  }

  test("concurrent commit: second writer on the same parent loses " +
      "with ConcurrentModificationException") {
    val dir = freshDir("race")
    Snapshots.init(spark.range(100)
      .select(col("id"), lit("x").as("text")), dir, "id", 2)
    // simulate the racing winner by pre-creating v1
    val winner = Seq((1L, "won")).toDF("id", "text")
    Snapshots.upsert(spark, dir, winner, "id")
    // a loser that computed against v0 now tries to commit v1 again
    assert(Files.exists(Paths.get(dir, "_manifests", "v1")))
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.testCommitAt(spark, dir, 1L, Seq("nope.parquet"))
    }
    // the winner's manifest is untouched by the failed commit
    assert(slurp(dir).contains((1L, "won")))
  }

  test("vacuum drops old versions' exclusive files, keeps everything " +
      "retained versions reference") {
    val dir = freshDir("vac")
    Snapshots.init(spark.range(400)
      .select(col("id"), concat(lit("d"), col("id")).as("text")),
      dir, "id", 4)
    Snapshots.upsert(spark, dir,
      Seq((1L, "d1-v2")).toDF("id", "text"), "id")
    Snapshots.upsert(spark, dir,
      Seq((399L, "d399-v2")).toDF("id", "text"), "id")
    val before = slurp(dir)
    val deleted = Snapshots.vacuum(spark, dir, retainFrom = 2L)
    assert(deleted.nonEmpty)
    // latest still reads exactly
    assert(slurp(dir) == before)
    assert(slurpAt(dir, 2) == before)
    // time travel below the floor is gone
    intercept[IllegalArgumentException] { slurpAt(dir, 0) }
    // deleted files are really gone from data/
    deleted.foreach { f =>
      assert(!Files.exists(Paths.get(dir, "data", f)))
    }
    // and every retained-manifest file still exists
    Snapshots.manifest(spark, dir, 2L).foreach { f =>
      assert(Files.exists(Paths.get(dir, "data", f)))
    }
  }

  test("diff between versions: inserted/deleted/updated classified, " +
      "rewritten-but-identical survivors dropped, shared files unread") {
    val dir = freshDir("diff")
    val base = spark.range(1000)
      .select(col("id"), concat(lit("doc-"), col("id")).as("text"))
    Snapshots.init(base, dir, "id", numFiles = 8)
    Snapshots.upsert(spark, dir, Seq((5L, "doc-5-v2"),
      (2000L, "doc-2000")).toDF("id", "text"), "id")
    Snapshots.delete(spark, dir, Seq(7L).toDF("id"), "id")

    val d01 = Snapshots.diff(spark, dir, 0L, 1L, "id")
      .as[(String, Long, String)].collect().toSet
    assert(d01 == Set(("updated", 5L, "doc-5-v2"),
      ("inserted", 2000L, "doc-2000")))
    val d12 = Snapshots.diff(spark, dir, 1L, 2L, "id")
      .as[(String, Long, String)].collect().toSet
    assert(d12 == Set(("deleted", 7L, "doc-7")))
    val d02 = Snapshots.diff(spark, dir, 0L, 2L, "id")
      .as[(String, Long, String)].collect().toSet
    assert(d02 == Set(("updated", 5L, "doc-5-v2"),
      ("inserted", 2000L, "doc-2000"), ("deleted", 7L, "doc-7")))

    // the diff's plan reads only non-shared files: v0∩v1 share 7 of 8
    // base files, so the 0→1 diff must scan ≤ 3 files' worth of paths
    val m0 = Snapshots.manifest(spark, dir, 0L).toSet
    val m1 = Snapshots.manifest(spark, dir, 1L).toSet
    assert(m0.intersect(m1).size == 7)
    assert((m0 -- m1).size + (m1 -- m0).size <= 3)
  }

  test("compact: new version has fewer files and identical rows; " +
      "history still travels; diff across the compaction is empty") {
    val dir = freshDir("compact")
    Snapshots.init(spark.range(500)
      .select(col("id"), concat(lit("d"), col("id")).as("text")),
      dir, "id", 4)
    // ten tiny insert-only upserts fragment the table
    (0 until 10).foreach { i =>
      Snapshots.upsert(spark, dir,
        Seq((1000L + i, s"new-$i")).toDF("id", "text"), "id")
    }
    val vFrag = Snapshots.latestVersion(spark, dir).get
    val fragFiles = Snapshots.manifest(spark, dir, vFrag).size
    assert(fragFiles >= 13, s"expected fragmentation, got $fragFiles")
    val before = slurp(dir)

    val c = Snapshots.compact(spark, dir, "id",
      targetFileBytes = 64L * 1024 * 1024)
    assert(c.files.size < fragFiles && c.files.size <= 2)
    assert(slurp(dir) == before)
    assert(slurpAt(dir, vFrag) == before)   // history intact
    assert(slurpAt(dir, 0).size == 500)
    // every file replaced, no row changed
    assert(Snapshots.diff(spark, dir, vFrag, c.version, "id")
      .isEmpty)
  }

  test("vacuum reclaims orphaned data files (crashed/race-losing " +
      "writers) once past the grace window, never inside it") {
    val dir = freshDir("orphan")
    Snapshots.init(spark.range(100)
      .select(col("id"), lit("x").as("text")), dir, "id", 2)
    // plant an orphan: a data file no manifest references
    val orphan = Paths.get(dir, "data", "part-orphan-test.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    // inside the grace window: spared
    assert(Snapshots.vacuum(spark, dir, retainFrom = 0L).isEmpty)
    assert(Files.exists(orphan))
    // past the grace window: reclaimed, live files untouched
    val deleted = Snapshots.vacuum(spark, dir, retainFrom = 0L,
      orphanGraceMs = 0L)
    assert(deleted == Seq("part-orphan-test.parquet"))
    assert(!Files.exists(orphan))
    assert(Snapshots.read(spark, dir).count() == 100)
  }

  test("lookup opens only footer-touched files and returns exactly " +
      "the requested keys; version-pinned lookups see old values") {
    val dir = freshDir("lookup")
    val base = spark.range(1000)
      .select(col("id"), concat(lit("doc-"), col("id")).as("text"))
    Snapshots.init(base, dir, "id", numFiles = 8)
    Snapshots.upsert(spark, dir,
      Seq((5L, "doc-5-v2")).toDF("id", "text"), "id")

    val got = Snapshots.lookup(spark, dir,
      Seq(5L, 6L, 5000L).toDF("id"), "id")
      .as[(Long, String)].collect().toSet
    assert(got == Set((5L, "doc-5-v2"), (6L, "doc-6")))
    val old = Snapshots.lookup(spark, dir,
      Seq(5L).toDF("id"), "id", asOf = Some(0L))
      .as[(Long, String)].collect().toSet
    assert(old == Set((5L, "doc-5")))
    // the plan reads a pruned file subset, not the table: contiguous
    // keys 5,6 live in at most 2 of the 9 current files
    val plan = Snapshots.lookup(spark, dir,
      Seq(5L, 6L).toDF("id"), "id")
      .queryExecution.executedPlan.toString
    val scanned = "part-[0-9a-f-]+".r.findAllIn(plan).toSet
    assert(scanned.size <= 2, s"scanned ${scanned.size} files:\n" +
      plan.take(1500))
    // absent keys in an untouched range → empty, zero files opened
    assert(Snapshots.lookup(spark, dir,
      Seq(99999L).toDF("id"), "id").isEmpty)
  }

  test("deleting every row commits an empty version that reads as a " +
      "zero-row frame with the prior schema") {
    val dir = freshDir("empty")
    Snapshots.init(spark.range(20)
      .select(col("id"), lit("t").as("text")), dir, "id", 1)
    Snapshots.delete(spark, dir,
      spark.range(20).select(col("id")), "id")
    val latest = Snapshots.read(spark, dir)
    assert(latest.schema.fieldNames.toSeq == Seq("id", "text"))
    assert(latest.count() == 0)
    assert(slurpAt(dir, 0).size == 20) // history intact
  }

  test("schema evolution: evolveSchema upsert adds a nullable column " +
      "without rewriting cold files; every era resolves its own schema") {
    val dir = freshDir("evolve")
    val base = spark.range(1000)
      .select(col("id"), concat(lit("doc-"), col("id")).as("text"))
    val c0 = Snapshots.init(base, dir, "id", numFiles = 8)

    // new column without the flag → rejected, nothing committed
    val widened = Seq((5L, "doc-5-v2", 0.9), (2000L, "doc-2000", 0.1))
      .toDF("id", "text", "score")
    intercept[IllegalArgumentException] {
      Snapshots.upsert(spark, dir, widened, "id")
    }
    assert(Snapshots.latestVersion(spark, dir).contains(0L))

    val c1 = Snapshots.upsert(spark, dir, widened, "id",
      evolveSchema = true)
    // add-column costs ONE manifest: cold files carried by reference
    assert(c1.filesReplaced == 1, c1.toString)
    assert(c0.files.toSet.intersect(c1.files.toSet).size == 7)

    // latest reads the widened schema; untouched rows (cold files AND
    // rewritten survivors) read the new column as NULL
    val v1 = Snapshots.read(spark, dir)
    assert(v1.schema.fieldNames.toSeq == Seq("id", "text", "score"))
    val byId = v1.select("id", "text", "score")
      .as[(Long, String, Option[Double])].collect().map(r => r._1 -> r)
      .toMap
    assert(byId(5L) == ((5L, "doc-5-v2", Some(0.9))))
    assert(byId(2000L) == ((2000L, "doc-2000", Some(0.1))))
    assert(byId(6L) == ((6L, "doc-6", None))) // survivor in rewritten file
    assert(byId(999L) == ((999L, "doc-999", None))) // cold file
    assert(v1.count() == 1001)

    // time travel below the evolution keeps the ORIGINAL schema
    assert(Snapshots.read(spark, dir, Some(0L)).schema.fieldNames.toSeq
      == Seq("id", "text"))
    assert(Snapshots.tableSchema(spark, dir, Some(0L)).fieldNames.toSeq
      == Seq("id", "text"))

    // diff across the evolution: only truly-changed keys, with the new
    // column present (survivors hash-cancel despite the rewrite)
    val d = Snapshots.diff(spark, dir, 0L, 1L, "id")
      .select("change", "id").as[(String, Long)].collect().toSet
    assert(d == Set(("updated", 5L), ("inserted", 2000L)))

    // lookup serves the evolved column; a later plain upsert and a
    // delete both inherit the evolved schema
    val looked = Snapshots.lookup(spark, dir,
      Seq(5L, 6L).toDF("id"), "id")
      .select("id", "score").as[(Long, Option[Double])].collect().toSet
    assert(looked == Set((5L, Some(0.9)), (6L, None)))
    Snapshots.upsert(spark, dir,
      Seq((7L, "doc-7-v2", Option.empty[Double]))
        .toDF("id", "text", "score"), "id")
    Snapshots.delete(spark, dir, Seq(8L).toDF("id"), "id")
    assert(Snapshots.read(spark, dir).schema.fieldNames.toSeq
      == Seq("id", "text", "score"))

    // contract guards: a missing existing column and a re-typed column
    // are both rejected even with the flag
    intercept[IllegalArgumentException] {
      Snapshots.upsert(spark, dir, Seq((9L, "x")).toDF("id", "text"),
        "id", evolveSchema = true)
    }
    intercept[IllegalArgumentException] {
      Snapshots.upsert(spark, dir,
        Seq((9L, "x", "not-a-double")).toDF("id", "text", "score"),
        "id", evolveSchema = true)
    }
  }

  test("legacy manifests without a schema header still read, diff and " +
      "lookup via file-inferred schema") {
    val dir = freshDir("legacy")
    val c0 = Snapshots.init(spark.range(50)
      .select(col("id"), lit("t").as("text")), dir, "id", 2)
    // rewrite v0's manifest as a header-less legacy file (drop the
    // Hadoop LocalFS checksum sidecar too — the raw rewrite invalidates it)
    val mf = Paths.get(dir, "_manifests", "v0")
    Files.write(mf, c0.files.mkString("\n").getBytes("UTF-8"))
    Files.deleteIfExists(Paths.get(dir, "_manifests", ".v0.crc"))
    assert(Snapshots.committedSchema(spark, dir, 0L).isEmpty)
    assert(Snapshots.tableSchema(spark, dir).fieldNames.toSeq
      == Seq("id", "text"))
    assert(Snapshots.read(spark, dir).count() == 50)
    val up = Snapshots.upsert(spark, dir,
      Seq((0L, "t2")).toDF("id", "text"), "id")
    // the child commit records a schema header even over a legacy parent
    assert(Snapshots.committedSchema(spark, dir, up.version).nonEmpty)
    assert(Snapshots.diff(spark, dir, 0L, 1L, "id").count() == 1)
  }

  test("guards: double init rejected; read of uninitialized dir " +
      "rejected; vacuum refusing to drop all versions") {
    val dir = freshDir("guards")
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, dir)
    }
    Snapshots.init(spark.range(10)
      .select(col("id"), lit("t").as("text")), dir, "id", 1)
    intercept[IllegalArgumentException] {
      Snapshots.init(spark.range(10)
        .select(col("id"), lit("t").as("text")), dir, "id", 1)
    }
    intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, dir, retainFrom = 99L)
    }
  }

  test("a table deleted and re-created at the same path never serves " +
      "the old table's cached manifest (init evicts the path)") {
    val dir = freshDir("recreate")
    Snapshots.init(spark.range(50)
      .select(col("id"), lit("old").as("text")), dir, "id", 2)
    // populate the manifest cache with the OLD table's v0
    assert(slurpAt(dir, 0).forall(_._2 == "old"))
    // drop and re-create at the SAME path — the (mtime, length) cache
    // validity check can collide on coarse-mtime filesystems, so init
    // must evict the path outright
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(new java.io.File(dir))
    Snapshots.init(spark.range(50)
      .select(col("id"), lit("new").as("text")), dir, "id", 2)
    assert(slurpAt(dir, 0).forall(_._2 == "new"),
      "re-created table must not read the old table's cached lines")
  }
}
