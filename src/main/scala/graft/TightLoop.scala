package graft

import org.apache.spark.sql.SparkSession

/** Builder tooling (r16): endless trivial-action loop for jstack
  * sampling of the fixed per-action driver cost.
  */
object TightLoop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 3000
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => spark.range(1).count(): Unit)
    println(f"[tight] per=${(System.nanoTime() - t0) / 1e6 / n}%6.1fms")
    spark.stop()
  }
}
