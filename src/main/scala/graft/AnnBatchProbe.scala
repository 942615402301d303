package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Builder tooling (r17): per-batch duration trace of the streaming ANN
  * ingest — which batch carries the max (start-up backlog vs tier
  * fold), so the VERDICT r16 #6 target (max_batch < 2 s) is attributed
  * before it is chased. Usage: runMain graft.AnnBatchProbe [tps] [secs]
  */
object AnnBatchProbe {
  def main(args: Array[String]): Unit = {
    val tps = args.headOption.map(_.toInt).getOrElse(40000)
    val secs = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "16384"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("aprobe_idx").toString
    val seed = spark.range(20000).select(
      (col("id") + 1000000000L).as("doc_id"),
      graft.streaming.AnnIngest.embedStub(
        graft.gen.SyntheticDocs.textFor(col("id") + 1000000000L), 64)
        .as("embedding"))
    graft.extra.AnnIndex.buildAndWriteIvfPq(seed, "doc_id", "embedding",
      dir, numCentroids = 32)
    // same warm-up as the bench block
    locally {
      val wDir = Files.createTempDirectory("aprobe_warm").toString
      graft.extra.AnnIndex.buildAndWriteIvfPq(
        seed.limit(2000), "doc_id", "embedding", wDir, numCentroids = 32)
      val wBatch = spark.range(20000).select(col("id").as("doc_id"),
        graft.streaming.AnnIngest.embedStub(
          graft.gen.SyntheticDocs.textFor(col("id")), 64).as("embedding"))
      graft.extra.AnnIndex.appendIvfPq(spark, wDir, wBatch, "doc_id",
        "embedding",
        codebooks = Some(graft.extra.AnnIndex.readCodebooks(spark, wDir)))
    }
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(j.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))).getOrElse("")
          jobStarts.put(j.jobId, (j.time, d.take(50))): Unit
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStarts.get(j.jobId)
          if (s != null)
            println(f"[job] ${j.jobId}%4d ${(j.time - s._1) / 1e3}%6.2f s  ${s._2}")
        }
      })
    val docs = graft.gen.SyntheticDocs.rateDocs(spark, tps)
    val monitor = new graft.streaming.Monitor().attach(spark)
    val ckpt = Files.createTempDirectory("aprobe_ckpt").toString
    val writing = new AtomicBoolean(true)
    val q = graft.streaming.AnnIngest.start(docs, dir, ckpt, dim = 64,
      trigger = Trigger.ProcessingTime(0), sinkGate = () => writing.get())
    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e9 < secs) Thread.sleep(200)
    writing.set(false)
    Thread.sleep(1500)
    q.stop()
    monitor.snapshot.foreach { p =>
      println(f"[batch] ${p.batch_id}%3d rows=${p.num_input_rows}%7d " +
        f"ms=${p.batch_duration_ms}%6d")
    }
    spark.stop()
  }
}
