package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic synthetic tick generator — the reference producer
  * (src/producer/synthetic_ticks.py) as a distributed, SEEDED batch
  * transform. The reference steps a per-symbol GBM random walk
  * (synthetic_ticks.py:51-57: price *= exp((μ − σ²/2)Δt + σ√Δt·z)) with
  * an unseeded RNG; here the walk is a column-expression cumulative sum
  * of CONTENT-HASH-derived gaussians (Box–Muller over xxhash64(id, seed)
  * uniforms — same trick as [[graft.extra.Sampling]]), so every run on
  * any cluster shape produces identical ticks — a fixture, not a
  * side-effecting producer. `randn(seed)` would NOT give this: it is
  * seed-deterministic only for a fixed partitioning, and `spark.range(n)`
  * partition count tracks default parallelism.
  *
  * Scale: `spark.range(n)` parallelizes the index space; the only
  * shuffle is the per-symbol cumulative-sum sort window. For very long
  * series, chunk the cumsum (sum per block, then prefix-sum blocks).
  */
object TickGen {

  final case class GbmConfig(
      symbols: Seq[String] = Seq("AAPL", "MSFT", "GOOG"),
      ticksPerSecond: Int = 50,
      basePrice: Double = 100.0,
      volatility: Double = 0.2,
      drift: Double = 0.05,
      startEpochMs: Long = 1704067200000L, // 2024-01-01 UTC
      seed: Long = 42L)

  /** n ticks round-robin across symbols with GBM prices: columns
    * (symbol, price, event_time_ms) — the exact tick wire schema.
    */
  def gbm(spark: SparkSession, n: Long, cfg: GbmConfig = GbmConfig()): DataFrame = {
    val k = cfg.symbols.size
    val dt = 1.0 / (cfg.ticksPerSecond.toDouble / k) / 86400.0 / 365.0
    val stepMs = (1000.0 / cfg.ticksPerSecond).toLong.max(1L)
    val w = Window.partitionBy(col("symbol")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark.range(n)
      .withColumn("symbol",
        element_at(array(cfg.symbols.map(lit): _*),
          (pmod(col("id"), lit(k.toLong)) + 1).cast("int")))
      .withColumn("z", hashGaussian(col("id"), cfg.seed))
      .withColumn("logstep",
        lit((cfg.drift - cfg.volatility * cfg.volatility / 2) * dt) +
          lit(cfg.volatility * math.sqrt(dt)) * col("z"))
      .withColumn("price",
        round(lit(cfg.basePrice) * exp(sum(col("logstep")).over(w)), 4))
      .withColumn("event_time_ms", lit(cfg.startEpochMs) + col("id") * stepMs)
      .select("symbol", "price", "event_time_ms")
  }

  /** Standard normal derived from a content hash of `id` — Box–Muller
    * over two xxhash64 uniforms. Partitioning-independent (unlike
    * `randn(seed)`) and codegen-native: identical output on any
    * cluster/core count.
    */
  private def hashGaussian(id: org.apache.spark.sql.Column, seed: Long) = {
    // Uniform in (0, 1]: hash to [0, 2^40), shift to (0, 2^40].
    val scale = (1L << 40).toDouble
    def uniform(salt: Long) =
      (pmod(xxhash64(id, lit(seed), lit(salt)), lit(1L << 40)) + 1) / scale
    sqrt(lit(-2.0) * log(uniform(0x9E3779B9L))) *
      cos(lit(2.0 * math.Pi) * uniform(0x85EBCA6BL))
  }
}
