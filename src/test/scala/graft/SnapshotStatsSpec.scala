package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.extra.Snapshots

/** Manifest-level file statistics (Iceberg-style data skipping): every
  * commit records each data file's key range in the manifest, pruning
  * plans from those recorded ranges without opening parquet footers,
  * carried-by-reference files keep their parent's entries, and
  * range-less legacy manifests still read via the footer fallback.
  */
class SnapshotStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"snapstat-$tag").toString

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(StandardCharsets.UTF_8))

  test("init/upsert/compact record per-file ranges; carried files " +
      "keep their parent entries verbatim") {
    val dir = freshDir("cover")
    val base = spark.range(1000)
      .select(col("id"), concat(lit("doc-"), col("id")).as("text"))
    val c0 = Snapshots.init(base, dir, "id", numFiles = 8)
    val r0 = Snapshots.fileRanges(spark, dir, 0L)
    assert(r0.keySet == c0.files.toSet) // every file has a range
    // ranges are disjoint-ish and ordered: global min/max span 0..999
    assert(r0.values.map(_._1.toLong).min == 0L)
    assert(r0.values.map(_._2.toLong).max == 999L)

    val c1 = Snapshots.upsert(spark, dir,
      Seq((5L, "v2"), (2000L, "new")).toDF("id", "text"), "id")
    val r1 = Snapshots.fileRanges(spark, dir, 1L)
    assert(r1.keySet == c1.files.toSet)
    // files shared between v0 and v1 carry identical recorded ranges
    val shared = c0.files.toSet.intersect(c1.files.toSet)
    assert(shared.nonEmpty)
    shared.foreach(f => assert(r1(f) == r0(f)))

    val c2 = Snapshots.compact(spark, dir, "id", targetFileBytes = 1L << 30)
    val r2 = Snapshots.fileRanges(spark, dir, c2.version)
    assert(r2.keySet == c2.files.toSet)
    assert(r2.values.map(_._2.toLong).max == 2000L)
  }

  test("pruning plans from manifest ranges alone: a lookup against a " +
      "manifest of stats-bearing but NONEXISTENT files never opens one") {
    val dir = freshDir("noopen")
    Files.createDirectories(Paths.get(dir, "_manifests"))
    // hand-written manifest: schema + ranges for two phantom files.
    // If pruning read footers instead of the manifest, lookup would
    // throw FileNotFoundException; an out-of-range probe must instead
    // plan an empty file set and return zero rows.
    val schema = new StructType().add("id", LongType).add("text", StringType)
    val lines = Seq(
      "#schema=" + schema.json,
      s"#keycol=${b64("id")}", // stats apply only to the recorded key
      s"#range=${b64("ghost-a.parquet")},${b64("0")},${b64("499")}",
      s"#range=${b64("ghost-b.parquet")},${b64("500")},${b64("999")}",
      "ghost-a.parquet",
      "ghost-b.parquet")
    Files.write(Paths.get(dir, "_manifests", "v0"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val out = Snapshots.lookup(spark, dir,
      Seq(5000L).toDF("id"), "id")
    assert(out.count() == 0L)
    // an in-range probe DOES select the phantom file — proving the
    // range metadata, not file existence or footers, drives the plan
    intercept[Exception] {
      Snapshots.lookup(spark, dir, Seq(7L).toDF("id"), "id").count()
    }
  }

  test("legacy range-less manifest still reads and prunes via the " +
      "footer fallback; lookup results match the stats path") {
    val dir = freshDir("legacy")
    val base = spark.range(500)
      .select(col("id"), concat(lit("d-"), col("id")).as("text"))
    val c0 = Snapshots.init(base, dir, "id", numFiles = 4)
    // simulate a pre-stats manifest: same files, no #range lines
    Snapshots.testCommitAt(spark, dir, 1L, c0.files)
    assert(Snapshots.fileRanges(spark, dir, 1L).isEmpty)
    val viaStats = Snapshots.lookup(spark, dir,
      Seq(7L, 420L).toDF("id"), "id", asOf = Some(0L))
      .select("id", "text").as[(Long, String)].collect().toSet
    val viaFooters = Snapshots.lookup(spark, dir,
      Seq(7L, 420L).toDF("id"), "id", asOf = Some(1L))
      .select("id", "text").as[(Long, String)].collect().toSet
    assert(viaStats == Set((7L, "d-7"), (420L, "d-420")))
    assert(viaFooters == viaStats)
  }

  test("string keys round-trip through the manifest encoding and " +
      "prune lexicographically, matching parquet BINARY stats order") {
    val dir = freshDir("strkey")
    val docs = Seq("apple", "banana", "cherry", "kiwi", "mango",
      "peach", "pear", "plum").zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    Snapshots.init(docs, dir, "k", numFiles = 4)
    val ranges = Snapshots.fileRanges(spark, dir, 0L)
    assert(ranges.size == 4)
    assert(ranges.values.map(_._1).min == "apple")
    assert(ranges.values.map(_._2).max == "plum")
    val hit = Snapshots.lookup(spark, dir, Seq("mango").toDF("k"), "k")
    assert(hit.select("v").as[Long].collect().toSeq == Seq(4L))
    // the lookup's planned file set is range-pruned, not the full table
    assert(hit.inputFiles.length < 4)
  }

  test("statsCols: secondary-column ranges recorded at init, carried " +
      "on upsert, and readRange skips non-matching files") {
    val dir = freshDir("cols")
    // id-clustered with ts correlated to id (one second per id) —
    // the streaming-append shape where secondary ranges prune well
    val base = spark.range(1000).select(col("id"),
      timestamp_micros(col("id") * 1000000L + 1700000000000000L)
        .as("ts"),
      (col("id") % 7).as("v"))
    Snapshots.init(base, dir, "id", numFiles = 8, statsCols = Seq("ts"))
    assert(Snapshots.statsColumns(spark, dir, 0L) == Seq("ts"))
    assert(Snapshots.columnRanges(spark, dir, 0L, "ts").size == 8)

    val lo = java.time.Instant.ofEpochSecond(1700000100L) // id 100
    val hi = java.time.Instant.ofEpochSecond(1700000150L) // id 150
    val out = Snapshots.readRange(spark, dir, "ts", lo, hi)
    assert(out.count() == 51)
    // ids 100..150 live in 2 of the 8 clustered files
    assert(out.inputFiles.length <= 2)

    // the statsCols choice persists across commits without re-stating
    val upd = spark.range(3).select((col("id") + 5000L).as("id"),
      timestamp_micros(col("id") * 1000000L + 1705000000000000L)
        .as("ts"),
      lit(0L).as("v"))
    Snapshots.upsert(spark, dir, upd, "id")
    assert(Snapshots.statsColumns(spark, dir, 1L) == Seq("ts"))
    val out1 = Snapshots.readRange(spark, dir, "ts", lo, hi)
    assert(out1.count() == 51)
    assert(out1.inputFiles.length <= 2)
    // the new window only matches the upserted file(s)
    val out2 = Snapshots.readRange(spark, dir, "ts",
      java.time.Instant.ofEpochSecond(1705000000L),
      java.time.Instant.ofEpochSecond(1705000010L))
    assert(out2.count() == 3)
    assert(out2.inputFiles.length == 1)
  }

  test("readRange on the cluster key uses the #range stats; a column " +
      "with no recorded stats reads conservatively but exactly") {
    val dir = freshDir("rrkey")
    val base = spark.range(800).select(col("id"), (col("id") % 5).as("v"))
    Snapshots.init(base, dir, "id", numFiles = 8)
    val byKey = Snapshots.readRange(spark, dir, "id", 100L, 150L)
    assert(byKey.count() == 51)
    assert(byKey.inputFiles.length <= 2)
    // no stats for v: all files read, result still exact
    val byV = Snapshots.readRange(spark, dir, "v", 0L, 1L)
    assert(byV.count() == 320)
    assert(byV.inputFiles.length == 8)
    // lookup on a NON-key column must ignore the key's #range stats
    // (they describe id, not v) and fall back to footer-statting v
    val byV2 = Snapshots.lookup(spark, dir, Seq(2L).toDF("v"), "v")
    assert(byV2.count() == 160)
    // rewrites on a different column than the recorded cluster key
    // would degrade the layout and corrupt carried stats — rejected
    intercept[IllegalArgumentException] {
      Snapshots.delete(spark, dir, Seq(0L).toDF("v"), "v")
    }
  }

  test("readRange string pruning follows UTF-8 byte order, not UTF-16: " +
      "a supplementary-char key survives a U+FFFD lower bound") {
    val dir = freshDir("u8ord")
    // U+1F600 (😀) encodes ABOVE U+FFFD in UTF-8 (F0.. > EF..) but its
    // UTF-16 lead surrogate 0xD83D sorts BELOW 0xFFFD — a UTF-16
    // driver compare would prune the file holding the matching row
    val docs = Seq(("alpha", 1L), ("beta", 2L), ("😀", 3L))
      .toDF("k", "v")
    Snapshots.init(docs, dir, "k", numFiles = 2)
    val out = Snapshots.readRange(spark, dir, "k",
      "�", "🚀")
    assert(out.select("v").as[Long].collect().toSeq == Seq(3L))
  }

  test("a table deleted and re-created at the same path serves the " +
      "NEW table — the manifest cache validates against file metadata") {
    val dir = freshDir("recreate")
    Snapshots.init(spark.range(10).select(col("id"),
      lit("old").as("t")), dir, "id", 1)
    assert(Snapshots.read(spark, dir).count() == 10) // populates cache
    // wipe and rebuild a DIFFERENT table at the same path
    def rmrf(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmrf(_))
      java.nio.file.Files.delete(p)
    }
    rmrf(Paths.get(dir))
    Snapshots.init(spark.range(7).select(col("id"),
      lit("new").as("t")), dir, "id", 1)
    val back = Snapshots.read(spark, dir)
    assert(back.count() == 7)
    assert(back.select("t").distinct().head().getString(0) == "new")
  }

  test("a legacy #range-without-#keycol parent's stats are NOT carried " +
      "into a child stamped with a different key") {
    val dir = freshDir("legacycarry")
    // v = id so footer pruning on v behaves like id — a targeted
    // delete on v touches one file and carries the rest
    val base = spark.range(400).select(col("id"), col("id").as("v"))
    val c0 = Snapshots.init(base, dir, "id", numFiles = 4)
    // hand-write v1: same files, same ranges, but NO #keycol — the
    // pre-#keycol manifest format
    val schema = Snapshots.tableSchema(spark, dir, Some(0L))
    val r0 = Snapshots.fileRanges(spark, dir, 0L)
    val lines = Seq("#schema=" + schema.json) ++
      c0.files.map(f => s"#range=${b64(f)},${b64(r0(f)._1)},${b64(r0(f)._2)}") ++
      c0.files
    Files.write(Paths.get(dir, "_manifests", "v1"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    // rewrite keyed on v — allowed (legacy parent has no recorded key)
    val c2 = Snapshots.delete(spark, dir, Seq(5L).toDF("v"), "v")
    assert(c2.filesReplaced < c0.files.size) // some files carried
    // the carried files' id-ranges must NOT appear as v-ranges
    val r2 = Snapshots.fileRanges(spark, dir, c2.version)
    val carried = c0.files.toSet.intersect(c2.files.toSet)
    carried.foreach(f => assert(!r2.contains(f)))
    // and the result is still exact (footer fallback, conservative)
    assert(Snapshots.read(spark, dir).count() == 399)
  }

  test("lookup reads only the manifest-range-matching files") {
    val dir = freshDir("prune")
    val base = spark.range(1024)
      .select(col("id"), (col("id") * 3).as("v"))
    Snapshots.init(base, dir, "id", numFiles = 8)
    val out = Snapshots.lookup(spark, dir, Seq(12L).toDF("id"), "id")
    assert(out.inputFiles.length == 1)
    assert(out.select("v").as[Long].collect().toSeq == Seq(36L))
  }
}
