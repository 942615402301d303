package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Spark's `rand(seed)`/`sample` are seed-deterministic only for a FIXED
  * partitioning — repartition the input (or rescale the cluster) and the
  * sample changes. These operators key every decision on a content hash
  * of a stable id instead: the same row lands in the same split on any
  * cluster, any partitioning, any engine (md5 arithmetic is reproducible
  * in the DuckDB oracle) — the property that matters when a 100 TB
  * corpus is re-sharded between runs and train/test contamination is
  * unacceptable.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of the id column. */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long") %
      buckets

  /** Train/val/test assignment by percentage thresholds over a 100-way
    * hash bucket: e.g. (80, 10) → train < 80 <= val < 90 <= test.
    */
  def withSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    df.withColumn("bucket", hashBucket(col(idCol), 100))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))

  /** Deterministic fraction sample: keep rows whose hash bucket (out of
    * 10000) falls below fraction*10000. Partitioning-independent.
    */
  def deterministicSample(df: DataFrame, idCol: String,
      fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol), 10000) < (fraction * 10000).toLong)

  /** Stratified deterministic sample: per-class keep fractions (classes
    * absent from the map get `defaultFraction`). Same content-hash
    * mechanics as [[deterministicSample]] — a row's fate depends only on
    * its id and its class's fraction, so rebalancing a skewed corpus
    * (e.g. downsampling the dominant language) is reproducible on any
    * partitioning, any engine, any run. Pure projection + filter: no
    * shuffle, fully pushdown-friendly.
    */
  def stratifiedSample(df: DataFrame, idCol: String, classCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(
      lit((defaultFraction * 10000).toLong)) { case (els, (cls, f)) =>
      when(col(classCol) === cls, lit((f * 10000).toLong)).otherwise(els)
    }
    df.filter(hashBucket(col(idCol), 10000) < threshold)
  }
}
