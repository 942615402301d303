package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Builder tooling (r16): does Spark 4.1 satisfy ClusteredDistribution
  * from a SUBSET hash partitioning (groupBy/join/window over a parent
  * repartition on a key prefix) without a new Exchange?
  */
object SubsetProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(1000).select(($"id" % 10).as("a"),
      ($"id" % 7).as("b"), $"id".as("v"))
    val p = df.repartition($"a")
    println("=== groupBy(a,b) over repartition(a) ===")
    p.groupBy($"a", $"b").agg(sum($"v")).explain()
    println("=== join on (a,b): p vs p.groupBy(a,b) agg ===")
    val agg = p.groupBy($"a", $"b").agg(count(lit(1)).as("c"))
    p.join(agg, Seq("a", "b")).explain()
    println("=== window partitionBy(a,b) over repartition(a) ===")
    p.withColumn("cc",
      count(lit(1)).over(Window.partitionBy($"a", $"b"))).explain()
    spark.stop()
  }
}
