package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder tooling (r16): what does ONE tiny job cost on a warm JVM?
  * Times 30 trivial 1-task jobs, 30 one-exchange jobs, and 10
  * broadcast-join builds, so per-query job counts translate to seconds.
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String, n: Int)(f: Int => Unit): Unit = {
      (1 to 3).foreach(f) // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(f)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ovh] $name%-34s total=$dt%6.2fs per=${dt / n * 1000}%7.1fms")
    }
    time("range(1).count (1 task)", 30)(_ => spark.range(1).count(): Unit)
    time("range(1e4).agg (narrow)", 30)(_ =>
      spark.range(10000).agg(sum("id")).head(): Unit)
    val d = spark.range(100000).select($"id", ($"id" % 97).as("k"))
    time("groupBy shuffle (1 exchange)", 30)(i =>
      d.groupBy("k").agg(sum("id")).filter($"k" === i % 97).count(): Unit)
    time("2-exchange chain", 20)(i =>
      d.groupBy("k").agg(sum("id").as("s"))
        .groupBy(($"k" % 7).as("k7")).agg(sum("s"))
        .filter($"k7" === i % 7).count(): Unit)
    val small = spark.range(97).select($"id".as("k"), ($"id" * 2).as("v"))
    time("broadcast join build+probe", 20)(_ =>
      d.join(broadcast(small), $"k" === $"k", "left").count(): Unit)
    time("localCheckpoint(eager) tiny", 20)(_ =>
      d.limit(1000).localCheckpoint(true).count(): Unit)
    spark.stop()
  }
}
