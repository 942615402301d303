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
    spark.stop()
  }
}
