package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.extra.Snapshots

/** TREE-format snapshot manifests (manifest-list → key-range chunk
  * files) + commit-timestamp time travel: identical read/write/diff
  * semantics to the flat format, with planning cost O(touched chunks)
  * and commit cost O(changed) — the Iceberg manifest-tree property.
  * The tree engages above `spark.graft.snapshot.filesPerManifest`,
  * pinned low here so toy tables exercise it.
  */
class SnapshotTreeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"snaptree-$tag").toString

  private def slurpAt(dir: String, v: Long): Set[(Long, String)] =
    Snapshots.read(spark, dir, Some(v)).select("id", "text")
      .as[(Long, String)].collect().toSet

  private def versionLines(dir: String, v: Long): Seq[String] =
    new String(Files.readAllBytes(Paths.get(dir, "_manifests", s"v$v")),
      "UTF-8").linesIterator.toSeq

  private def chunkNames(dir: String, v: Long): Seq[String] =
    versionLines(dir, v).filter(_.startsWith("#mchunk=")).map { l =>
      new String(java.util.Base64.getDecoder.decode(
        l.stripPrefix("#mchunk=").split(",")(0)), "UTF-8")
    }

  private def withChunkSize[T](n: Int)(f: => T): T = {
    spark.conf.set(Snapshots.FilesPerManifestKey, n.toString)
    try f finally spark.conf.unset(Snapshots.FilesPerManifestKey)
  }

  test("tree lifecycle: init → upsert → delete → compact → vacuum " +
      "semantics identical to flat; chunks shared by reference") {
    withChunkSize(4) {
      val dir = freshDir("life")
      val base = spark.range(1000)
        .select(col("id"), concat(lit("doc-"), col("id")).as("text"))
      val c0 = Snapshots.init(base, dir, "id", numFiles = 16)
      assert(c0.files.size == 16)
      // 16 files / 4 per chunk = 4 chunks, tree format
      val chunks0 = chunkNames(dir, 0)
      assert(chunks0.size == 4, s"expected 4 chunks, got $chunks0")
      assert(versionLines(dir, 0).forall(_.startsWith("#")),
        "a tree version file lists no data files inline")

      val c1 = Snapshots.upsert(spark, dir,
        Seq((5L, "doc-5-v2"), (2000L, "doc-2000")).toDF("id", "text"),
        "id")
      assert(c1.filesReplaced == 1, c1.toString)
      val chunks1 = chunkNames(dir, 1)
      // 3 of 4 chunks carried BY NAME (their key ranges miss 5/2000)
      assert(chunks0.toSet.intersect(chunks1.toSet).size == 3,
        s"v0=$chunks0 v1=$chunks1")

      Snapshots.delete(spark, dir, Seq(5L, 7L).toDF("id"), "id")
      val v0 = (0L until 1000L).map(i => (i, s"doc-$i")).toSet
      val v1 = v0 -- Set((5L, "doc-5"), (6L, "doc-6")) ++
        Set((5L, "doc-5-v2"), (6L, "doc-6"), (2000L, "doc-2000"))
      val v2 = v1 -- Set((5L, "doc-5-v2"), (7L, "doc-7"))
      assert(slurpAt(dir, 0) == v0)
      assert(slurpAt(dir, 1) == v1)
      assert(slurpAt(dir, 2) == v2)

      // diff across tree versions
      val d01 = Snapshots.diff(spark, dir, 0L, 1L, "id")
        .as[(String, Long, String)].collect().toSet
      assert(d01 == Set(("updated", 5L, "doc-5-v2"),
        ("inserted", 2000L, "doc-2000")))

      // lookup prunes to ≤2 files through the tree
      val got = Snapshots.lookup(spark, dir,
        Seq(6L, 2000L).toDF("id"), "id")
        .as[(Long, String)].collect().toSet
      assert(got == Set((6L, "doc-6"), (2000L, "doc-2000")))

      // compact re-packs data AND manifests; history intact
      val cc = Snapshots.compact(spark, dir, "id")
      assert(slurpAt(dir, cc.version) == v2)
      assert(slurpAt(dir, 0) == v0)
      assert(Snapshots.diff(spark, dir, 2L, cc.version, "id").isEmpty)

      // vacuum to the compaction point: dropped versions' exclusive
      // chunks and data files die; the survivor reads exactly
      val deleted = Snapshots.vacuum(spark, dir, cc.version,
        orphanGraceMs = 0L)
      assert(deleted.nonEmpty)
      assert(slurpAt(dir, cc.version) == v2)
      intercept[IllegalArgumentException] { slurpAt(dir, 0) }
      // no dropped-version chunk file survives unless shared forward
      val liveChunks = chunkNames(dir, cc.version).toSet
      val onDisk = Files.list(Paths.get(dir, "_manifests")).toArray
        .map(_.toString.split("/").last).filter(_.startsWith("c-")).toSet
      assert(onDisk == liveChunks,
        s"orphan chunks left: ${onDisk -- liveChunks}")
    }
  }

  test("planning reads only the version file + touched chunks; a " +
      "miss-everything commit rewrites no carried chunk") {
    withChunkSize(4) {
      val dir = freshDir("plan")
      Snapshots.init(spark.range(1024)
        .select(col("id"), concat(lit("d"), col("id")).as("text")),
        dir, "id", numFiles = 32) // 8 chunks
      val chunks0 = chunkNames(dir, 0)
      assert(chunks0.size == 8)

      // cold planning pass: count PHYSICAL manifest reads for a
      // single-key lookup — version file + 1 chunk, not 8
      graft.extra.Snapshots.evictTableForTest(spark, dir)
      val before = Snapshots.manifestReadCount.get()
      val rows = Snapshots.lookup(spark, dir, Seq(700L).toDF("id"), "id")
        .collect()
      val reads = Snapshots.manifestReadCount.get() - before
      assert(rows.map(_.getLong(0)).toSet == Set(700L))
      assert(reads <= 2, s"lookup read $reads manifest files (want ≤2)")

      // an insert beyond every range: no chunk is read or rewritten;
      // the child carries all 8 refs + 1 new chunk
      graft.extra.Snapshots.evictTableForTest(spark, dir)
      val b2 = Snapshots.manifestReadCount.get()
      val c1 = Snapshots.upsert(spark, dir,
        Seq((5000L, "new")).toDF("id", "text"), "id")
      val commitReads = Snapshots.manifestReadCount.get() - b2
      assert(c1.filesReplaced == 0)
      val chunks1 = chunkNames(dir, 1)
      assert(chunks0.forall(chunks1.contains),
        "all parent chunks must be carried by name")
      assert(chunks1.size == chunks0.size + 1)
      // version file + (0 chunk bodies — chunk-level prune missed all)
      assert(commitReads <= 2,
        s"miss-everything commit read $commitReads manifest files")
    }
  }

  test("diff between tree versions cancels shared chunks without " +
      "expanding them: planning reads only the changed chunks") {
    withChunkSize(4) {
      val dir = freshDir("difft")
      Snapshots.init(spark.range(1024)
        .select(col("id"), concat(lit("d"), col("id")).as("text")),
        dir, "id", numFiles = 32) // 8 chunks
      Snapshots.upsert(spark, dir,
        Seq((5L, "d5-v2"), (2000L, "new")).toDF("id", "text"), "id")
      graft.extra.Snapshots.evictTableForTest(spark, dir)
      val before = Snapshots.manifestReadCount.get()
      val d = Snapshots.diff(spark, dir, 0L, 1L, "id")
        .as[(String, Long, String)].collect().toSet
      val reads = Snapshots.manifestReadCount.get() - before
      assert(d == Set(("updated", 5L, "d5-v2"), ("inserted", 2000L, "new")))
      // 2 version files + the ≤2 non-shared chunks per side — never
      // the 8-chunk inventory
      assert(reads <= 6, s"diff read $reads manifest files")
    }
  }

  test("rebalance guard: a long run of tiny inserts re-packs the " +
      "chunk list instead of growing it per-commit") {
    withChunkSize(8) {
      val dir = freshDir("rebal")
      Snapshots.init(spark.range(128)
        .select(col("id"), lit("x").as("text")), dir, "id", 16)
      (0 until 40).foreach { i =>
        Snapshots.upsert(spark, dir,
          Seq((1000L + i, s"n$i")).toDF("id", "text"), "id")
      }
      val v = Snapshots.latestVersion(spark, dir).get
      val total = Snapshots.manifest(spark, dir, v).size
      val refs = chunkNames(dir, v).size
      val packed = (total + 7) / 8
      // without the guard refs would be 2 + 40 = 42; the guard bounds
      // the list at max(16, 4·packed)
      assert(refs <= math.max(16, 4 * packed) && refs < 42,
        s"$refs chunk refs for $total files (packed=$packed)")
      assert(Snapshots.read(spark, dir).count() == 168)
    }
  }

  test("restore on a tree table: chunk refs re-committed BY NAME — " +
      "no chunk reads or rewrites, content exact") {
    withChunkSize(4) {
      val dir = freshDir("restore")
      Snapshots.init(spark.range(512)
        .select(col("id"), lit("x").as("text")), dir, "id", 16): Unit
      (0 until 3).foreach { i =>
        Snapshots.upsert(spark, dir,
          Seq((i * 7L, s"v$i")).toDF("id", "text"), "id"): Unit
      }
      val srcChunks = chunkNames(dir, 0).toSet
      graft.extra.Snapshots.evictTableForTest(spark, dir)
      val before = Snapshots.manifestReadCount.get()
      val c = Snapshots.restore(spark, dir, 0L)
      val reads = Snapshots.manifestReadCount.get() - before
      // cold restore plans from the latest + target version FILES
      // only — carried chunks are named, never opened
      assert(reads <= 2, s"restore read $reads manifest files")
      assert(c.version == 4L)
      assert(chunkNames(dir, 4).toSet == srcChunks,
        "restored version must reference v0's chunk files by name")
      assert(slurpAt(dir, 4) == slurpAt(dir, 0))
      assert(slurpAt(dir, 3) != slurpAt(dir, 0))
    }
  }

  test("readRange prunes chunks on secondary-column aggregates; " +
      "key-column ranges prune the same way") {
    withChunkSize(4) {
      val dir = freshDir("range")
      // ts correlates with id → near-disjoint per-chunk ts ranges
      val df = spark.range(1024).select(col("id"),
        (col("id") * 1000).as("ts"),
        concat(lit("d"), col("id")).as("text"))
      Snapshots.init(df, dir, "id", numFiles = 32,
        statsCols = Seq("ts"))
      graft.extra.Snapshots.evictTableForTest(spark, dir)
      val before = Snapshots.manifestReadCount.get()
      val got = Snapshots.readRange(spark, dir, "ts", 10000L, 12000L)
        .select("id").as[Long].collect().toSet
      val reads = Snapshots.manifestReadCount.get() - before
      assert(got == (10L to 12L).toSet)
      assert(reads <= 2, s"readRange read $reads manifest files")
      val byKey = Snapshots.readRange(spark, dir, "id", 100L, 103L)
        .select("id").as[Long].collect().toSet
      assert(byKey == (100L to 103L).toSet)
    }
  }

  test("schema evolution lands on a tree parent: cold chunks carried " +
      "by name, evolved column reads NULL from carried files") {
    withChunkSize(4) {
      val dir = freshDir("evolve")
      Snapshots.init(spark.range(256)
        .select(col("id"), concat(lit("d"), col("id")).as("text")),
        dir, "id", numFiles = 16) // 4 chunks
      val chunks0 = chunkNames(dir, 0)
      val widened = Seq((3L, "d3-v2", 0.9)).toDF("id", "text", "score")
      Snapshots.upsert(spark, dir, widened, "id", evolveSchema = true)
      // 3 cold chunks carried by name across the evolution
      assert(chunks0.toSet.intersect(chunkNames(dir, 1).toSet).size == 3)
      val got = Snapshots.read(spark, dir)
        .select("id", "text", "score")
        .as[(Long, String, Option[Double])].collect()
        .map(r => r._1 -> r).toMap
      assert(got(3L) == ((3L, "d3-v2", Some(0.9))))
      assert(got(200L) == ((200L, "d200", None))) // cold carried chunk
      assert(got.size == 256)
      // time travel below the evolution keeps the original schema
      assert(Snapshots.read(spark, dir, Some(0L)).schema.fieldNames.toSeq
        == Seq("id", "text"))
    }
  }

  test("history: one row per retained version with stamp, txn, file " +
      "count and format — tree versions counted without chunk reads") {
    withChunkSize(4) {
      val dir = freshDir("hist")
      Snapshots.init(spark.range(64)
        .select(col("id"), lit("x").as("text"),
          col("id").cast("decimal(38,0)").as("ver")),
        dir, "id", numFiles = 16)
      def batch(text: String, v: Long) = Seq((999L, text, v))
        .toDF("id", "text", "ver")
        .withColumn("ver", col("ver").cast("decimal(38,0)"))
      Snapshots.upsert(spark, dir, batch("new", 1L), "id")
      graft.streaming.SnapshotStream.applyBatch(batch("newer", 2L),
        dir, "id", "ver", appId = "histapp", batchId = 5L)
      GraftExtensions.registerAll(spark)
      val h = spark.sql(
        s"SELECT * FROM graft_snapshot_history('$dir') ORDER BY version")
        .collect()
      assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
      assert(h.forall(r => !r.isNullAt(1)), "every commit is stamped")
      assert(h(2).getString(2) == "histapp" && h(2).getLong(3) == 5L)
      assert(h(0).getLong(4) == 16L && h(0).getString(5) == "tree")
      // counting a tree version's files reads no chunk bodies
      graft.extra.Snapshots.evictTableForTest(spark, dir)
      val before = Snapshots.manifestReadCount.get()
      Snapshots.history(spark, dir).collect()
      val reads = Snapshots.manifestReadCount.get() - before
      assert(reads <= 3, s"history read $reads manifest files for 3 " +
        "versions (chunk bodies must not be expanded)")
    }
  }

  test("randomized differential: the same op sequence against a FLAT " +
      "and a TREE table agrees at every version, lookup and readRange " +
      "(seeded)") {
    val rnd = new scala.util.Random(4242)
    val flatDir = freshDir("difflat")
    val treeDir = freshDir("diftree")
    def base = spark.range(300)
      .select(col("id"), concat(lit("b"), col("id")).as("text"))
    Snapshots.init(base, flatDir, "id", numFiles = 12)
    withChunkSize(4) {
      Snapshots.init(base, treeDir, "id", numFiles = 12)
    }
    // tree conf scoped per-op so the tree table keeps committing tree
    // versions while the flat twin stays flat
    def onBoth(op: String => Unit): Unit = {
      op(flatDir)
      withChunkSize(4)(op(treeDir))
    }
    (0 until 12).foreach { i =>
      rnd.nextInt(4) match {
        case 0 =>
          val ks = Seq.fill(3)(rnd.nextInt(400).toLong).distinct
          onBoth(d => Snapshots.delete(spark, d, ks.toDF("id"), "id"): Unit)
        case 3 if i % 5 == 4 =>
          onBoth(d => Snapshots.compact(spark, d, "id",
            targetFileBytes = 32L * 1024): Unit)
        case _ =>
          val rows = Seq.fill(5)(rnd.nextInt(400).toLong).distinct
            .map(k => k -> s"i$i-$k")
          onBoth(d => Snapshots.upsert(spark, d,
            rows.toDF("id", "text"), "id"): Unit)
      }
    }
    val vMax = Snapshots.latestVersion(spark, flatDir).get
    assert(Snapshots.latestVersion(spark, treeDir).contains(vMax))
    def slurpV(d: String, v: Long) = Snapshots.read(spark, d, Some(v))
      .select("id", "text").as[(Long, String)].collect().toSet
    (0L to vMax).foreach { v =>
      assert(slurpV(flatDir, v) == slurpV(treeDir, v),
        s"content diverged at v$v")
    }
    val probe = Seq(5L, 150L, 399L, 777L).toDF("id")
    assert(
      Snapshots.lookup(spark, flatDir, probe, "id")
        .as[(Long, String)].collect().toSet ==
      Snapshots.lookup(spark, treeDir, probe, "id")
        .as[(Long, String)].collect().toSet)
    assert(
      Snapshots.readRange(spark, flatDir, "id", 100L, 160L)
        .as[(Long, String)].collect().toSet ==
      Snapshots.readRange(spark, treeDir, "id", 100L, 160L)
        .as[(Long, String)].collect().toSet)
    // and the tree table really is in tree format
    assert(chunkNames(treeDir, vMax).nonEmpty)
  }

  test("vacuumOlderThan: keeps every version inside the retention " +
      "window PLUS the window-start snapshot; young tables are a no-op") {
    val dir = freshDir("ret")
    val saved = Snapshots.clock
    var now = 1000L
    Snapshots.clock = () => now
    try {
      Snapshots.init(spark.range(40)
        .select(col("id"), lit("v0").as("text")), dir, "id", 2)
      now = 2000L
      Snapshots.upsert(spark, dir, Seq((1L, "v1")).toDF("id", "text"), "id")
      now = 3000L
      Snapshots.upsert(spark, dir, Seq((2L, "v2")).toDF("id", "text"), "id")
      // everything younger than the window → no-op
      now = 3100L
      assert(Snapshots.vacuumOlderThan(spark, dir,
        java.time.Duration.ofMillis(5000)).isEmpty)
      assert(Snapshots.latestVersion(spark, dir).contains(2L))
      assert(Snapshots.read(spark, dir, Some(0L)).count() == 40)
      // window [now-1500, now] = [8500, 10000]: v1 (ts 2000) is the
      // window-start snapshot? No — cutoff 8500 resolves v2 (ts 3000
      // <= 8500), so v0 and v1 fall, v2 survives
      now = 10000L
      Snapshots.vacuumOlderThan(spark, dir,
        java.time.Duration.ofMillis(1500), orphanGraceMs = 0L): Unit
      intercept[IllegalArgumentException] {
        Snapshots.read(spark, dir, Some(0L)).count()
      }
      assert(Snapshots.read(spark, dir, Some(2L)).count() == 40)
      // cutoff between v1 and v2: v1 is the window-start snapshot and
      // must survive — build a fresh table to check the boundary
      val dir2 = freshDir("ret2")
      now = 1000L
      Snapshots.init(spark.range(10)
        .select(col("id"), lit("a").as("text")), dir2, "id", 1)
      now = 2000L
      Snapshots.upsert(spark, dir2, Seq((1L, "b")).toDF("id", "text"), "id")
      now = 3000L
      Snapshots.upsert(spark, dir2, Seq((2L, "c")).toDF("id", "text"), "id")
      now = 3500L // window [2500, 3500]: v1 (2000) = start snapshot
      Snapshots.vacuumOlderThan(spark, dir2,
        java.time.Duration.ofMillis(1000), orphanGraceMs = 0L): Unit
      intercept[IllegalArgumentException] {
        Snapshots.read(spark, dir2, Some(0L)).count()
      }
      assert(Snapshots.read(spark, dir2, Some(1L)).count() == 10)
      assert(Snapshots.read(spark, dir2, Some(2L)).count() == 10)
    } finally Snapshots.clock = saved
  }

  test("commit timestamps: monotonic stamps, versionAsOf resolves " +
      "latest ≤ t, readAsOfTime travels, TVF accepts TIMESTAMP") {
    val dir = freshDir("ts")
    // pin the clock: commits at 1000, 2000, 3000 (monotonic guard
    // bumps a stalled clock by +1)
    val ticks = Iterator(1000L, 2000L, 2000L, 3000L)
    val saved = Snapshots.clock
    Snapshots.clock = () => if (ticks.hasNext) ticks.next() else 9000L
    try {
      Snapshots.init(spark.range(10)
        .select(col("id"), lit("v0").as("text")), dir, "id", 1)
      Snapshots.upsert(spark, dir,
        Seq((1L, "v1")).toDF("id", "text"), "id")
      Snapshots.upsert(spark, dir,
        Seq((2L, "v2")).toDF("id", "text"), "id")
      assert(Snapshots.commitTime(spark, dir, 0L).contains(1000L))
      assert(Snapshots.commitTime(spark, dir, 1L).contains(2000L))
      // stalled clock at v2: monotonic guard stamps 2001
      assert(Snapshots.commitTime(spark, dir, 2L).contains(2001L))

      assert(Snapshots.versionAsOf(spark, dir, 1000L) == 0L)
      assert(Snapshots.versionAsOf(spark, dir, 1999L) == 0L)
      assert(Snapshots.versionAsOf(spark, dir, 2000L) == 1L)
      assert(Snapshots.versionAsOf(spark, dir, 5000L) == 2L)
      intercept[IllegalArgumentException] {
        Snapshots.versionAsOf(spark, dir, 999L)
      }
      val asOf = Snapshots.readAsOfTime(spark, dir,
        java.time.Instant.ofEpochMilli(2000L))
        .select("id", "text").as[(Long, String)].collect().toMap
      // v1 committed exactly at t=2000 wins; v2 (t=2001) is not yet
      // visible, so id 2 still reads its init value
      assert(asOf(1L) == "v1" && asOf(2L) == "v0")

      // SQL: graft_snapshot('dir', TIMESTAMP '...') — resolves the
      // same version
      GraftExtensions.registerAll(spark)
      val lit2s = java.time.Instant.ofEpochMilli(2000L).toString
        .replace("T", " ").replace("Z", "")
      val sqlRows = spark.sql(
        s"SELECT text FROM graft_snapshot('$dir', TIMESTAMP '$lit2s" +
          s"+00:00') WHERE id = 1").as[String].collect().toSeq
      assert(sqlRows == Seq("v1"))
    } finally Snapshots.clock = saved
  }
}
