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
