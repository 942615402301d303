package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.extra.{Layout, Merge}

/** Keyed copy-on-write merge: semantic parity with the naive full
  * rewrite, file-level pruning on footer stats, and the crash-ordering
  * contract (untouched files never move).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"merge-$tag").toString
    d
  }

  /** id-clustered base table: ids 0..999 in 8 disjoint-range files. */
  private def writeBase(dir: String): DataFrame = {
    val base = spark.range(1000)
      .select(col("id"), (col("id") % 7).cast("double").as("v"),
        concat(lit("doc-"), col("id")).as("text"))
    Layout.writeClustered(base, dir, Seq(col("id")), 8)
    base
  }

  private def filesOf(dir: String): Map[String, Long] =
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
      .map(p => p -> Files.size(Paths.get(p))).toMap

  test("upsert replaces same-key rows, inserts new keys, and matches " +
      "the naive anti-join ∪ updates rewrite exactly") {
    val dir = freshDir("parity")
    val base = writeBase(dir)
    // 3 updated keys inside one file's range + 2 brand-new keys
    val updates = Seq(
      (5L, 99.0, "doc-5-v2"), (6L, 98.0, "doc-6-v2"), (7L, 97.0, "doc-7-v2"),
      (5000L, 1.0, "doc-5000"), (5001L, 2.0, "doc-5001"))
      .toDF("id", "v", "text")
    val stats = Merge.upsert(spark, dir, updates, "id")

    val expected = base.join(updates.select("id"), Seq("id"), "left_anti")
      .unionByName(updates)
    val got = spark.read.parquet(dir)
    assert(got.count() == 1002)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    assert(stats.filesTotal == 8)
    // 5,6,7 are contiguous → land in one clustered file's range
    assert(stats.filesRewritten == 1, stats.toString)
  }

  test("files whose key range holds no update key are not rewritten " +
      "or even moved (same path, same bytes)") {
    val dir = freshDir("prune")
    writeBase(dir)
    val before = filesOf(dir)
    val updates = Seq((0L, 50.0, "doc-0-v2"), (999L, 51.0, "doc-999-v2"))
      .toDF("id", "v", "text")
    val stats = Merge.upsert(spark, dir, updates, "id")
    val after = filesOf(dir)
    // first + last clustered files rewritten; the 6 middle ones intact
    assert(stats.filesRewritten == 2, stats.toString)
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size == 6, s"expected 6 surviving paths, " +
      s"got ${untouched.size}")
    untouched.foreach(p => assert(before(p) == after(p), s"$p changed size"))
    assert(spark.read.parquet(dir).filter($"id" === 0L)
      .head().getString(2) == "doc-0-v2")
  }

  test("insert-only batch (keys beyond every file range) rewrites " +
      "nothing and appends one clustered file") {
    val dir = freshDir("insert")
    writeBase(dir)
    val nBefore = filesOf(dir).size
    val updates = Seq((2000L, 1.0, "a"), (3000L, 2.0, "b")).toDF("id", "v", "text")
    val stats = Merge.upsert(spark, dir, updates, "id")
    assert(stats.filesRewritten == 0)
    assert(filesOf(dir).size == nBefore + 1)
    assert(spark.read.parquet(dir).count() == 1002)
  }

  test("empty batch is a no-op; duplicate-key batch is rejected; " +
      "string keys prune on binary footer stats") {
    val dir = freshDir("edge")
    writeBase(dir)
    val before = filesOf(dir)
    val empty = Seq.empty[(Long, Double, String)].toDF("id", "v", "text")
    assert(Merge.upsert(spark, dir, empty, "id") ==
      Merge.MergeStats(8, 0, 0L))
    assert(filesOf(dir) == before)
    val dup = Seq((1L, 1.0, "x"), (1L, 2.0, "y")).toDF("id", "v", "text")
    val e = intercept[IllegalArgumentException](
      Merge.upsert(spark, dir, dup, "id"))
    assert(e.getMessage.contains("distinct"))

    // string-keyed table: zero-padded keys make range order lexical
    val sdir = freshDir("skey")
    val sbase = spark.range(100)
      .select(format_string("k%03d", col("id")).as("k"),
        col("id").cast("double").as("v"))
    Layout.writeClustered(sbase, sdir, Seq(col("k")), 4)
    val supd = Seq(("k007", 999.0), ("k950", 1.0)).toDF("k", "v")
    val sstats = Merge.upsert(spark, sdir, supd, "k")
    assert(sstats.filesRewritten == 1, sstats.toString) // k007 only
    val sgot = spark.read.parquet(sdir)
    assert(sgot.count() == 101)
    assert(sgot.filter($"k" === "k007").head().getDouble(1) == 999.0)
  }

  test("delete purges requested keys, prunes cold files, ignores " +
      "absent keys, and an empty key batch is a no-op") {
    val dir = freshDir("delete")
    writeBase(dir)
    val before = filesOf(dir)
    // 3 contiguous keys (one file's range) + one key absent from the
    // table AND beyond every file range (must not force any rewrite)
    val keys = Seq(10L, 11L, 12L, 99999L).toDF("id")
    val stats = Merge.delete(spark, dir, keys, "id")
    assert(stats.filesRewritten == 1, stats.toString)
    val got = spark.read.parquet(dir)
    assert(got.count() == 997)
    assert(got.filter($"id".isin(10L, 11L, 12L)).isEmpty)
    // cold files untouched in place
    val untouched = before.keySet.intersect(filesOf(dir).keySet)
    assert(untouched.size == 7, s"expected 7 surviving paths, " +
      s"got ${untouched.size}")
    // empty batch: nothing listed, nothing moved
    val after = filesOf(dir)
    assert(Merge.delete(spark, dir, Seq.empty[Long].toDF("id"), "id") ==
      Merge.MergeStats(8, 0, 0L))
    assert(filesOf(dir) == after)
  }

  test("upsertVersioned: stale rows discarded, newer and tied rows " +
      "win, new keys insert, replay is idempotent") {
    val dir = freshDir("versioned")
    // table carries its version column: (id, ver, text)
    val base = spark.range(100).select(col("id"),
      lit(5L).as("ver"), concat(lit("v5-"), col("id")).as("text"))
    Layout.writeClustered(base, dir, Seq(col("id")), 4)
    val batch = Seq(
      (10L, 3L, "stale"), // older than stored 5 → discarded
      (11L, 5L, "tied"), // equal → batch wins
      (12L, 9L, "fresh"), // newer → batch wins
      (500L, 1L, "new")) // absent key → insert
      .toDF("id", "ver", "text")
    val stats = Merge.upsertVersioned(spark, dir, batch, "id", "ver")
    def row(id: Long) = spark.read.parquet(dir)
      .filter($"id" === id).collect().map(r =>
        (r.getLong(1), r.getString(2))).toSeq
    assert(row(10L) == Seq((5L, "v5-10")))
    assert(row(11L) == Seq((5L, "tied")))
    assert(row(12L) == Seq((9L, "fresh")))
    assert(row(500L) == Seq((1L, "new")))
    assert(spark.read.parquet(dir).count() == 101)

    // replay the exact same batch: same content, no duplicates
    Merge.upsertVersioned(spark, dir, batch, "id", "ver")
    assert(spark.read.parquet(dir).count() == 101)
    assert(row(10L) == Seq((5L, "v5-10")) && row(12L) == Seq((9L, "fresh")))

    // within-batch reduction: max version per key applies; duplicate
    // (key, version) pairs are rejected as nondeterministic
    Merge.upsertVersioned(spark, dir,
      Seq((20L, 7L, "mid"), (20L, 8L, "top")).toDF("id", "ver", "text"),
      "id", "ver")
    assert(row(20L) == Seq((8L, "top")))
    val e = intercept[IllegalArgumentException](
      Merge.upsertVersioned(spark, dir,
        Seq((21L, 7L, "a"), (21L, 7L, "b")).toDF("id", "ver", "text"),
        "id", "ver"))
    assert(e.getMessage.contains("duplicate"))
  }

  test("upsert after delete round-trips: re-inserting a purged key " +
      "restores it exactly once") {
    val dir = freshDir("roundtrip")
    writeBase(dir)
    Merge.delete(spark, dir, Seq(42L).toDF("id"), "id")
    assert(spark.read.parquet(dir).filter($"id" === 42L).isEmpty)
    Merge.upsert(spark, dir,
      Seq((42L, 1.5, "doc-42-v2")).toDF("id", "v", "text"), "id")
    val rows = spark.read.parquet(dir).filter($"id" === 42L).collect()
    assert(rows.length == 1 && rows.head.getString(2) == "doc-42-v2")
    assert(spark.read.parquet(dir).count() == 1000)
  }
}
