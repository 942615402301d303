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

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** [[hashBucket]] evaluated JVM-side for typed (Dataset) paths —
    * BIT-IDENTICAL to the column form (first 12 hex chars of
    * md5(id.toString) = 48 bits, nonnegative, mod buckets), so typed
    * streaming operators shard exactly like their batch column twins.
    */
  def hashBucketLong(id: Long, buckets: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(String.valueOf(id).getBytes
      (java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h % buckets
  }

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

  /** Per-row weighted sampling: keep a row with probability `weight`
    * (a column in [0,1] — e.g. a quality score), decided by the
    * content hash of its id. The soft-quality-filter move: instead of
    * a hard threshold that cliffs at the cutoff, retention is
    * proportional to the score, preserving score-diversity while
    * shifting mass toward high quality. Pure projection + filter —
    * no shuffle, reproducible on any partitioning/engine; monotone in
    * the weight (raising a row's weight can only keep it).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.filter(hashBucket(col(idCol), 10000) < weight * 10000.0)

  /** Weighted domain mixing — the training-mixture primitive: each
    * domain (value of `domainCol`) is sampled at its own RATE, where a
    * rate above 1.0 means the domain is seen more than once per pass
    * (epoch upsampling, the standard way high-quality sources are
    * overweighted in LLM pre-training mixes) and a rate below 1.0
    * downsamples.
    *
    * Rate w splits into floor(w) guaranteed epochs plus one fractional
    * epoch kept with probability w − floor(w). Epochs materialize as an
    * `epoch` column (1-based) via a bounded `explode(sequence(…))` —
    * output size is Σ ceil(w_d)·|domain d|, never data-squared. The
    * fractional decision hashes (id, epoch), so it is independent of
    * the per-row sample decisions of OTHER epochs AND reproducible on
    * any partitioning, any cluster, any engine — a pure projection +
    * filter, no shuffle, no state.
    *
    * Domains absent from `rates` get `defaultRate`. A row's guaranteed
    * epochs survive unconditionally; only the LAST (fractional) epoch
    * is hash-gated.
    */
  def mixDomains(df: DataFrame, idCol: String, domainCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(_ >= 0),
      "domain rates must be non-negative")
    val rate10k = rates.foldLeft(lit((defaultRate * 10000).toLong)) {
      case (els, (d, w)) =>
        when(col(domainCol) === d, lit((w * 10000).toLong)).otherwise(els)
    }
    // ceil in exact integer arithmetic (DIV, not the fractional
    // Column./): rates arrive as 1e-4 fixed-point
    val epochs = expr("(__rate10k + 9999) DIV 10000")
    df.withColumn("__rate10k", rate10k)
      .filter(col("__rate10k") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), epochs)))
      .withColumn("__frac10k", col("__rate10k") - (col("epoch") - 1) * 10000L)
      // full epochs pass (__frac10k >= 10000); the final partial epoch
      // is gated on a hash of (id, epoch) so reruns reproduce it exactly
      .filter(col("__frac10k") >= 10000L ||
        hashBucket(concat(col(idCol).cast("string"), lit(":e"),
          col("epoch").cast("string")), 10000) < col("__frac10k"))
      .drop("__rate10k", "__frac10k")
  }

  /** CLUSTER-STRATIFIED sampling over an embedding column — the
    * diversity-balanced subset selection a pre-training mixture runs
    * AFTER dedup (SemDeDup's cousin with the opposite goal: instead of
    * dropping semantic duplicates, take a bounded, reproducible sample
    * from EVERY semantic region, so a head-heavy corpus cannot crowd
    * the tail topics out of the training cut):
    *
    *   1. rows are assigned to `numClusters` semantic clusters via the
    *      deterministic sample codebook
    *      ([[Similarity.assignClusters]] — a loop-codegen projection,
    *      no join, no shuffle);
    *   2. within each cluster, rows rank in content-hash order
    *      (md5(id), id — the library's deterministic shuffle) and the
    *      top `perCluster` survive.
    *
    * One exchange (the per-cluster rank window, which Spark's
    * WindowGroupLimit bounds to `perCluster` rows per group map-side,
    * so the shuffle carries O(clusters · perCluster), not the corpus);
    * output reproducible on any partitioning/engine. Swap
    * [[Similarity.kmeansCodebook]] in for trained clusters — the
    * assignment and ranking are unchanged.
    *
    * Returns (idCol, cluster_id, sample_rank), one row per sampled id.
    */
  def clusterStratifiedSample(emb: DataFrame, idCol: String,
      vecCol: String, numClusters: Int, perCluster: Int): DataFrame = {
    require(numClusters >= 1, s"numClusters must be >= 1: $numClusters")
    require(perCluster >= 1, s"perCluster must be >= 1: $perCluster")
    val cents = Similarity.sampleCodebook(emb, idCol, vecCol, numClusters)
    require(cents.nonEmpty, "empty embedding frame")
    // deliberately the WINDOW form, not Ranks.withGroupedRowNumber:
    // the rank <= k filter makes Spark insert WindowGroupLimit, a
    // map-side per-group top-k BEFORE the exchange, so the shuffle
    // carries O(clusters · perCluster) — strictly cheaper than any
    // full-rank pass. (The grouped two-pass rank is for UNLIMITED
    // per-group ranks, where no group-limit can apply.)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(md5(col("id").cast("string")), col("id"))
    Similarity.assignClusters(emb, idCol, vecCol, cents)
      .select(col("id"), col("cluster_id"))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= perCluster)
      .withColumnRenamed("id", idCol)
  }
}
