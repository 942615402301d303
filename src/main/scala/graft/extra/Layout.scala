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
