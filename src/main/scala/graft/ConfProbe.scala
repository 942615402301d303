package graft

import org.apache.spark.sql.SparkSession

/** Builder tooling (r16): A/B a runtime SQLConf over registry queries.
  * Usage: jrun graft.ConfProbe <conf=v|conf=v2> <query> [query...]
  * Example:
  *   ConfProbe "spark.sql.adaptive.enabled=true|false" kn_trigram_logprob
  * Runs each query n times under each value (interleaved), reports
  * medians side by side. Session conf only — must be runtime-settable.
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ConfProbe k=v1|v2 query...")
    val Array(key, vals) = args(0).split("=", 2)
    val values = vals.split('|').toSeq
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir =
      sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "16384"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = names.map(nm => nm -> SparkEntry.queries(nm))
    for (v <- values) {
      spark.conf.set(key, v)
      qs.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    spark.sharedState.cacheManager.clearCache()
    val times =
      collection.mutable.Map.empty[(String, String), List[Double]]
    for (_ <- 1 to n; v <- values; (nm, fn) <- qs) {
      spark.conf.set(key, v)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      times((nm, v)) =
        (System.nanoTime() - t0) / 1e9 :: times.getOrElse((nm, v), Nil)
    }
    for ((nm, _) <- qs; v <- values) {
      val ts = times((nm, v)).sorted
      println(f"[probe] $nm%-26s $key=$v%-8s median=${ts(ts.size / 2)}%6.2fs min=${ts.min}%6.2fs")
    }
    spark.stop()
  }
}
