package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.extra.Snapshots

/** Z-ordered snapshot clustering ([[graft.extra.Layout.writeZOrdered]]
  * wired into [[Snapshots.init]]/compact, r11 verdict #6): on a
  * 2-D-correlated table, a predicate on the SECOND dimension prunes
  * files through the manifest stats where 1-D key clustering reads
  * every file — and the choice persists across rewrites and compact.
  */
class SnapshotZOrderSpec extends SparkSpec {
  import spark.implicits._

  // 1024 points on a 32×32 grid: x = id >> 5 (high bits), y = id & 31
  // (low bits). Key-clustered files are contiguous id runs, so every
  // file spans the FULL y width; the Z-curve keeps both dims narrow.
  private def grid = spark.range(1024).select(
    col("id"),
    (col("id") / 32).cast("long").as("x"),
    (col("id") % 32).as("y"),
    concat(lit("p"), col("id")).as("text"))

  private def touchedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.inputFiles.length

  test("readRange on the second dimension prunes z-ordered files; " +
      "1-D clustering reads the whole table") {
    val flatDir = Files.createTempDirectory("zflat").toString
    val zDir = Files.createTempDirectory("zord").toString
    Snapshots.init(grid, flatDir, "id", numFiles = 32,
      statsCols = Seq("y"))
    Snapshots.init(grid, zDir, "id", numFiles = 32,
      zorderCols = Seq("x", "y"))
    assert(Snapshots.zorderColumns(spark, zDir, 0L) == Seq("x", "y"))
    // z dims are auto-added to the stats set
    assert(Snapshots.statsColumns(spark, zDir, 0L).toSet == Set("x", "y"))

    val want = (0L until 1024L).filter(i => (i % 32) <= 1)
      .map(i => (i, i % 32)).toSet
    val flatRead = Snapshots.readRange(spark, flatDir, "y", 0L, 1L)
    val zRead = Snapshots.readRange(spark, zDir, "y", 0L, 1L)
    assert(flatRead.select("id", "y").as[(Long, Long)].collect().toSet
      == want)
    assert(zRead.select("id", "y").as[(Long, Long)].collect().toSet
      == want)
    val flatTouched = touchedFiles(flatRead)
    val zTouched = touchedFiles(zRead)
    // key-clustered: y cycles inside every file → no pruning possible
    assert(flatTouched == 32, s"flat touched $flatTouched")
    // z-ordered: only files whose y-cells intersect [0,1]
    assert(zTouched <= 12, s"z-ordered touched $zTouched of 32 files")
    // and the first dimension prunes too
    assert(touchedFiles(
      Snapshots.readRange(spark, zDir, "x", 0L, 1L)) <= 12)
  }

  test("the z-order choice survives upsert and compact; semantics " +
      "stay exact") {
    val dir = Files.createTempDirectory("zlife").toString
    Snapshots.init(grid, dir, "id", numFiles = 32,
      zorderCols = Seq("x", "y"))
    Snapshots.upsert(spark, dir,
      Seq((7L, 0L, 7L, "p7-v2")).toDF("id", "x", "y", "text"), "id")
    val c = Snapshots.compact(spark, dir, "id",
      targetFileBytes = 16L * 1024)
    assert(Snapshots.zorderColumns(spark, dir, c.version)
      == Seq("x", "y"))
    val got = Snapshots.read(spark, dir).select("id", "text")
      .as[(Long, String)].collect().toMap
    assert(got(7L) == "p7-v2" && got.size == 1024)
    // post-compact, second-dim pruning still works
    val zRead = Snapshots.readRange(spark, dir, "y", 0L, 0L)
    assert(zRead.count() == 32)
    assert(touchedFiles(zRead) < c.files.size,
      s"compacted z table read all ${c.files.size} files")
    // guards: 1 dim rejected; string dim rejected
    intercept[IllegalArgumentException] {
      Snapshots.init(grid, Files.createTempDirectory("zbad").toString,
        "id", 4, zorderCols = Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.init(grid, Files.createTempDirectory("zbad2").toString,
        "id", 4, zorderCols = Seq("x", "text"))
    }
  }
}
