package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.extra.Layout

/** Storage layout: clustered writes give per-file disjoint key ranges
  * (the property file-skipping relies on); compaction collapses
  * micro-batch shards without losing rows.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeClustered: files carry disjoint sorted key ranges") {
    val dir = Files.createTempDirectory("layout_clustered").toString
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("k", pmod(col("id") * 7919, lit(10000L)))
    Layout.writeClustered(df, dir, Seq(col("k")), numFiles = 8)
    val files = spark.read.parquet(dir).inputFiles
    assert(files.length == 8)
    val ranges = files.map { f =>
      val s = spark.read.parquet(f).agg(min("k"), max("k")).head()
      (s.getLong(0), s.getLong(1))
    }.sortBy(_._1)
    // each file's min must lie beyond the previous file's max
    for (Seq((_, hi), (lo, _)) <- ranges.toSeq.sliding(2))
      assert(lo > hi, s"overlapping file ranges: $hi vs $lo")
    // nothing lost in the shuffle
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("writeZOrdered: per-file ranges are narrow on BOTH dimensions; " +
      "a 1-D clustered write leaves the second dimension full-width") {
    // 64x64 uniform grid: every (x, y) combination once
    val df = spark.range(0, 4096).toDF("id")
      .withColumn("x", col("id") % 64)
      .withColumn("y", floor(col("id") / 64).cast("long"))

    def avgWidths(dir: String): (Double, Double) = {
      val files = spark.read.parquet(dir).inputFiles
      val w = files.map { f =>
        val s = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (s.getLong(1) - s.getLong(0) + 1.0,
          s.getLong(3) - s.getLong(2) + 1.0)
      }
      (w.map(_._1).sum / w.length, w.map(_._2).sum / w.length)
    }

    val zdir = Files.createTempDirectory("layout_z").toString
    Layout.writeZOrdered(df, zdir, Seq("x", "y"), numFiles = 16,
      bitsPerDim = 6)
    val (zx, zy) = avgWidths(zdir)
    // 16 files over a 64x64 Z-curve = 16x16 cells per file
    assert(zx <= 24 && zy <= 24, s"z-order widths x=$zx y=$zy")

    val cdir = Files.createTempDirectory("layout_1d").toString
    Layout.writeClustered(df, cdir, Seq(col("x")), numFiles = 16)
    val (_, cy) = avgWidths(cdir)
    assert(cy >= 60, s"1-D clustering should leave y full-width, got $cy")

    // round trip: nothing lost
    assert(spark.read.parquet(zdir).count() == 4096)
    assert(spark.read.parquet(zdir)
      .agg(sum("x"), sum("y")).head().toSeq ==
      df.agg(sum("x"), sum("y")).head().toSeq)
  }

  test("compact: micro-batch shards collapse, rows and values preserved") {
    val src = Files.createTempDirectory("layout_src").toString
    val dst = Files.createTempDirectory("layout_dst").toString + "/out"
    // simulate 20 micro-batch appends of 4 partitions each
    for (b <- 0 until 20)
      spark.range(b * 100, (b + 1) * 100).toDF("id")
        .repartition(4).write.mode("append").parquet(src)
    val (before, after) = Layout.compact(spark, src, dst,
      targetFileBytes = 1L << 20)
    assert(before >= 80)
    assert(after < before / 10)
    assert(spark.read.parquet(dst).count() == 2000)
    assert(spark.read.parquet(dst).agg(sum("id")).head().getLong(0) ==
      (0L until 2000L).sum)
  }

  test("compact refuses to write onto its own input") {
    intercept[IllegalArgumentException] {
      Layout.compact(spark, "/tmp/same_dir_x", "/tmp/same_dir_x")
    }
  }
}
