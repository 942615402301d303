package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side stage profiler for the substr-ingest per-batch cost
  * (r14 verdict #3): times the dedup+write leg and the append leg of
  * one representative micro-batch separately, batch-mode (no streaming
  * scheduler), so the fixed per-batch overheads are attributable.
  *
  * Usage: runMain graft.SubstrStageProbe [batchDocs] [seedDocs]
  */
object SubstrStageProbe {
  def main(args: Array[String]): Unit = {
    val nBatch = args.headOption.map(_.toLong).getOrElse(100000L)
    val nSeed = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("sprobe_idx").toString
    val outDir = Files.createTempDirectory("sprobe_out").toString
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val seed = spark.range(nSeed).select(
      (col("id") + 1000000000L).as("doc_id"),
      graft.gen.SyntheticDocs.textFor(col("id") + 1000000000L).as("text"))
    t("seed build")(graft.extra.SubstrIndex.build(
      seed, "doc_id", "text", dir, k = 5, hashed = true))
    val batch = spark.range(nBatch).select(col("id").as("doc_id"),
      graft.gen.SyntheticDocs.textFor(col("id")).as("text"))
      .persist()
    t("batch materialize")(batch.count())
    // lazy one-shot form, stage by stage
    val cleaned = t("dedupBatch plan (incl probe)")(
      graft.extra.SubstrIndex.dedupBatch(spark, dir, batch,
        "doc_id", "text"))
    t("cleaned write")(cleaned.withColumnRenamed("text", "text")
      .write.mode("overwrite").parquet(s"$outDir/batch=0"))
    val reread = spark.read.parquet(s"$outDir/batch=0")
      .select(col("doc_id"), col("text"))
    t("append")(graft.extra.SubstrIndex.append(
      reread, "doc_id", "text", dir, txn = Some(("p", 0L))))
    // the streaming path end to end (pinned chain, write+append share
    // one materialization) against a fresh same-seed index
    val dir2 = Files.createTempDirectory("sprobe_idx2").toString
    val outDir2 = Files.createTempDirectory("sprobe_out2").toString
    t("seed build 2")(graft.extra.SubstrIndex.build(
      seed, "doc_id", "text", dir2, k = 5, hashed = true))
    t("applyBatch (pinned chain)")(
      graft.streaming.SubstrIngest.applyBatch(spark, dir2, outDir2,
        batch, "doc_id", "text", "probe", 0L, 0))
    // pinned dedup + write WITHOUT the append leg, fresh index again
    val dir3 = Files.createTempDirectory("sprobe_idx3").toString
    val outDir3 = Files.createTempDirectory("sprobe_out3").toString
    graft.extra.SubstrIndex.build(seed, "doc_id", "text", dir3,
      k = 5, hashed = true)
    t("pinned dedup+write only")(
      graft.extra.SubstrIndex.dedupBatchPinned(spark, dir3, batch,
        "doc_id", "text", 0) { (cleaned, _) =>
        cleaned.write.mode("overwrite").parquet(s"$outDir3/batch=0")
      })
    batch.unpersist()
    // WARM per-batch fixed-cost breakdown: a second batch of the same
    // size against the just-appended index, JIT and codegen caches
    // hot — this is the steady-state per-batch cost the streaming
    // equilibrium sees, stage by stage (the cold chain above charges
    // first-use compilation to whichever stage hits it first)
    val batch2 = spark.range(nBatch).select(
      (col("id") + 10000000L).as("doc_id"),
      graft.gen.SyntheticDocs.textFor(col("id") + 10000000L).as("text"))
      .persist()
    t("warm batch materialize")(batch2.count())
    t("warm isEmpty")(batch2.isEmpty)
    t("warm pinned chain total") {
      graft.extra.SubstrIndex.dedupBatchPinned(spark, dir2, batch2,
        "doc_id", "text", 0, probeCutoff = 64) { (cleanedRaw, rawGrams) =>
        val cleaned = cleanedRaw
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          t("  warm grams materialize")(rawGrams.count())
          t("  warm cleaned compute")(cleaned.count())
          t("  warm cleaned write (cached)")(
            cleaned.write.mode("overwrite").parquet(s"$outDir2/batch=1"))
          t("  warm append leg")(
            graft.extra.SubstrIndex.appendCleanedBatch(spark, dir2,
              rawGrams, cleaned, "doc_id", "text",
              txn = Some(("probe", 1L)), numFiles = 4))
        } finally cleaned.unpersist(blocking = false): Unit
      }
    }
    // and the full production streaming path, warm (the bench's
    // per-batch shape: requireLatest + txn + isEmpty + pinned chain at
    // the ingest probeCutoff)
    val batch3 = spark.range(nBatch).select(
      (col("id") + 20000000L).as("doc_id"),
      graft.gen.SyntheticDocs.textFor(col("id") + 20000000L).as("text"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty(
            "spark.job.description"))).getOrElse("")
        jobStarts.put(j.jobId, (j.time, desc.take(60))): Unit
      }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobStarts.get(j.jobId)
        if (s != null)
          println(f"[job] ${j.jobId}%4d ${(j.time - s._1) / 1e3}%6.2f s  ${s._2}")
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    t("warm applyBatch (production)")(
      graft.streaming.SubstrIngest.applyBatch(spark, dir2, outDir2,
        batch3, "doc_id", "text", "probe2", 0L, 0))
    Thread.sleep(500) // listener bus drain
    println(s"[stage] applyBatch jobs=${jobs.get} stages=${stages.get} " +
      s"tasks=${tasks.get}")
    // A/B: the same production batch with AQE disabled (plan executes
    // as one pipelined DAG per action instead of one job per query
    // stage)
    jobs.set(0); stages.set(0); tasks.set(0)
    val batch4 = spark.range(nBatch).select(
      (col("id") + 30000000L).as("doc_id"),
      graft.gen.SyntheticDocs.textFor(col("id") + 30000000L).as("text"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("warm applyBatch (AQE off)")(
      graft.streaming.SubstrIngest.applyBatch(spark, dir2, outDir2,
        batch4, "doc_id", "text", "probe3", 0L, 0))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    println(s"[stage] applyBatch AQEoff jobs=${jobs.get} " +
      s"stages=${stages.get} tasks=${tasks.get}")
    batch2.unpersist()
    spark.stop()
  }
}
