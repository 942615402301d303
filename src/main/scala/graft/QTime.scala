package graft

import org.apache.spark.sql.SparkSession

/** Builder tooling: time a subset of registered queries without paying
  * for the full [[Bench]] sweep. Usage:
  *
  *   sbt "runMain graft.QTime pagerank ngram_jaccard"
  *
  * Env mirrors Bench: SPARK_GRAFT_SF_DIR (default sf0.1),
  * SPARK_GRAFT_BENCH_N passes (default 3), SPARK_GRAFT_CPUS (default
  * 32 — Bench's driver value is 4, so absolute numbers differ; this
  * tool is for RELATIVE before/after comparisons while iterating).
  * Same warmup discipline as Bench: one untimed pass at sf0.001 so
  * codegen/JIT are hot, then interleaved timed passes, median reported.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QTime <query-name> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir =
      sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val qs = args.toSeq.map { name =>
      name -> SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
    }
    // builder-time extras (r16): lets A/B runs cover STATIC confs
    // (e.g. spark.sql.codegen.cache.maxEntries) that a session conf
    // set cannot touch. Format: "k=v;k=v".
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // mirror Bench (r16) so before/after numbers stay comparable
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "16384"))
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v): Unit
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    qs.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    spark.sharedState.cacheManager.clearCache()
    val times = collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to n; (name, fn) <- qs) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = dt :: times.getOrElse(name, Nil)
    }
    qs.foreach { case (name, _) =>
      val ts = times(name).sorted
      val med = ts(ts.size / 2)
      println(f"[qtime] $name%-28s median=$med%6.2fs " +
        f"min=${ts.min}%6.2fs max=${ts.max}%6.2fs n=$n")
    }
    spark.stop()
  }
}
