package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Builder-side probe for the substr-ingest stream accounting (not a
  * registered bench block): prints each micro-batch's engine-reported
  * input rows next to the out-dir row counts, so source over-production
  * vs listener double-count is decidable empirically.
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val tps = args.headOption.map(_.toInt).getOrElse(5000)
    val secs = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("probe_idx").toString
    val outDir = Files.createTempDirectory("probe_out").toString
    val seed = spark.range(20000).select(
      (col("id") + 1000000000L).as("doc_id"),
      graft.gen.SyntheticDocs.textFor(col("id") + 1000000000L).as("text"))
    graft.extra.SubstrIndex.build(seed, "doc_id", "text", dir,
      k = 5, hashed = true)
    val docs = graft.gen.SyntheticDocs.rateDocs(spark, tps)
    val ckpt = Files.createTempDirectory("probe_ckpt").toString
    val q = graft.streaming.SubstrIngest.start(docs, dir, outDir, ckpt,
      trigger = Trigger.ProcessingTime(0))
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit =
          println(s"[probe] batch=${e.progress.batchId} " +
            s"rows=${e.progress.numInputRows} " +
            s"durMs=${e.progress.durationMs}")
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
      })
    Thread.sleep(secs * 1000L)
    q.stop()
    val batchDirs = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch=") &&
        // a dir q.stop() interrupted mid-write holds only _temporary
        // debris — unreadable, so exclude it from the accounting
        Option(f.listFiles()).getOrElse(Array.empty)
          .exists(c => !c.getName.startsWith("_") &&
            !c.getName.startsWith(".")))
    if (batchDirs.isEmpty)
      println("[probe] no batch completed inside the window")
    else {
      val out = spark.read.option("basePath", outDir)
        .parquet(s"$outDir/batch=*")
      println(s"[probe] outDir total rows=${out.count()}")
      batchDirs.foreach(f =>
        println(s"[probe] ${f.getName}: " +
          s"${spark.read.parquet(f.toString).count()} rows"))
    }
    spark.stop()
  }
}
