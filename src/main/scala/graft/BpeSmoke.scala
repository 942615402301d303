package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extra.Text
import graft.model.Tables

/** Train a BPE merge list on the documents table and report the
  * compression it buys over whitespace tokens — the demo run that
  * produced the fixed merge list `token_counts_bpe` replays (the query
  * needs a FIXED list so its DuckDB oracle can replay it as nested
  * REPLACEs; production retrains via [[graft.extra.Text.trainBpe]] and
  * versions the list with the corpus like any quantizer).
  *
  * Usage: runMain graft.BpeSmoke [sfDir] [numMerges]
  */
object BpeSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val m = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val merges = Text.trainBpe(docs, "text", numMerges = m)
    val tTrain = (System.nanoTime() - t0) / 1e9
    println("merges = Seq(" + merges.map { case (a, b) =>
      "(\"" + a + "\", \"" + b + "\")"
    }.mkString(", ") + ")")
    val counted = Text.withBpeTokens(docs, "text", merges)
      .agg(sum("n_tokens").as("ws"), sum("n_bpe_tokens").as("bpe"))
      .head()
    println(s"""{"metric":"bpe_smoke","merges":${merges.size},""" +
      s""""train_wall_s":${StreamBench.rnd(tTrain)},""" +
      s""""ws_tokens":${counted.getLong(0)},""" +
      s""""bpe_tokens":${counted.getLong(1)}}""")
    spark.stop()
  }
}
