package graft

import org.apache.spark.sql.SparkSession

/** Builder tooling (r16): bisect the ~100 ms per-trivial-job cost —
  * raw RDD job vs SQL planning vs AQE vs codegen.
  */
object OverheadProbe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    def time(name: String, n: Int)(f: Int => Unit): Unit = {
      (1 to 5).foreach(f)
      val t0 = System.nanoTime()
      (1 to n).foreach(f)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ovh2] $name%-40s per=${dt / n * 1000}%7.1fms")
    }
    val one = sc.parallelize(Seq(1), 1)
    time("rdd 1-task count", 50)(_ => one.count(): Unit)
    val many = sc.parallelize(1 to 32, 32)
    time("rdd 32-task count", 50)(_ => many.count(): Unit)
    time("sql range(1).count AQE on", 30)(_ => spark.range(1).count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("sql range(1).count AQE off", 30)(_ => spark.range(1).count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // same plan re-executed: does caching the DataFrame object help?
    val df = spark.range(1)
    time("sql same-DF count AQE on", 30)(_ => df.count(): Unit)
    val rdd = spark.range(1).toDF().queryExecution.toRdd
    time("prepared toRdd count", 50)(_ => rdd.count(): Unit)
    spark.stop()
  }
}
