package graft.extra

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Storage-layout operators — the table-maintenance half of running this
  * engine against a large corpus:
  *
  *   - [[writeClustered]]: range-clustered parquet writes. Files carry
  *     disjoint sorted key ranges, so parquet footer min/max stats let
  *     any reader (this engine, the reference's DuckDB serving layer,
  *     Trino, …) prune whole files on point/range predicates — the
  *     poor-man's Z-order for 1-D key workloads (symbol, day, id).
  *   - [[compact]]: bin-pack a directory of small files into
  *     target-sized ones. Streaming sinks append one file per partition
  *     per micro-batch (the reference's last-wins store has the same
  *     issue); left alone, a week of 10-second triggers is ~10⁵ tiny
  *     files and every scan pays listing + per-file open costs.
  *
  * Both are driver-metadata + one distributed job; nothing collects rows.
  */
object Layout {

  /** Write `df` as parquet files clustered on `cols`: a range shuffle
    * into `numFiles` partitions + in-partition sort, so each output file
    * covers a disjoint `cols` range (modulo duplicate boundary keys) and
    * its footer min/max is maximally selective.
    */
  def writeClustered(df: DataFrame, path: String, cols: Seq[Column],
      numFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(mode).parquet(path)
  }

  /** Z-ORDER clustered parquet write: multi-dimensional file skipping —
    * the 2-D+ answer where [[writeClustered]]'s 1-D ranges leave every
    * other dimension at full width per file. Each dimension is bucketed
    * into 2^`bitsPerDim` equi-width cells between its own min/max
    * (driver-side extent probe — two scalars per dim), the cell indices
    * are BIT-INTERLEAVED into a Morton code, and files are range-
    * clustered on that code. Points close on the Z-curve are close in
    * EVERY dimension, so each file's footer min/max is narrow on all
    * `cols` at once and a predicate on ANY dimension prunes files.
    *
    * Equi-width cells keep the bucket assignment a pure projection
    * (no rank shuffle); for heavily skewed dimensions substitute
    * quantile boundaries from `approxQuantile` the same way — the
    * interleave and clustering are unchanged.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bitsPerDim: Int = 8,
      saveMode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2, "z-ordering needs at least 2 dimensions")
    require(bitsPerDim >= 1 && bitsPerDim * cols.size <= 62,
      s"bitsPerDim=$bitsPerDim with ${cols.size} dims overflows a long")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val cells = (1L << bitsPerDim) - 1
    // one row of constant extents (2·dims scalars) — driver-bounded
    val extAggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c")))
    val ext = df.agg(extAggs.head, extAggs.tail: _*).head()
    val buckets = cols.map { c =>
      val mn = ext.getAs[Double](s"__mn_$c")
      val mx = ext.getAs[Double](s"__mx_$c")
      if (mx == mn) lit(0L)
      else least(floor((col(c).cast("double") - lit(mn)) /
        ((lit(mx) - lit(mn)) / lit((cells + 1).toDouble))).cast("long"),
        lit(cells))
    }
    // static bit interleave: z = Σ_bit Σ_dim ((b_d >> bit & 1) << (bit·D + d))
    val d = cols.size
    val z = (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, bit) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, dim)) =>
        a.bitwiseOR(shiftleft(
          shiftright(b, bit).bitwiseAND(lit(1L)), bit * d + dim))
      }
    }
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(saveMode).parquet(path)
  }

  /** Total bytes of parquet data under `dir` (driver-side listing). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
      }
      total
    }
  }

  /** Compact the parquet files under `srcDir` into ≈`targetFileBytes`
    * files at `dstDir` (a different directory — Spark cannot overwrite
    * its own input in place; atomically swap directories afterwards if
    * in-place semantics are needed). Returns (filesBefore, filesAfter).
    *
    * Row-group-size realities mean output files land near but not
    * exactly on target; the point is turning 10⁴ micro-batch shards
    * into 10¹ scan-friendly files, not byte-exact packing.
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetFileBytes: Long = 128L << 20): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(new org.apache.hadoop.fs.Path(srcDir) !=
      new org.apache.hadoop.fs.Path(dstDir),
      "compact cannot write onto its own input; use a staging dir + rename")
    val df = spark.read.parquet(srcDir)
    val before = df.inputFiles.length
    val n = math.max(1L,
      (dataBytes(spark, srcDir) + targetFileBytes - 1) / targetFileBytes)
    df.repartition(n.toInt).write.mode(SaveMode.Overwrite).parquet(dstDir)
    val after = spark.read.parquet(dstDir).inputFiles.length
    (before, after)
  }
}
