package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit (builder tooling): dumps formatted plans for
  * representative queries and greps the properties that matter at scale
  * (filter/projection pushdown into the parquet scan, broadcast joins on
  * dim tables, whole-stage codegen coverage, no cartesian products).
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("recent_slice", "q1_pricing", "revenue_by_nation",
        "features_sliding", "topk_per_group", "neardup_embedding",
        "word_freq")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = graft.queries.Registry.byName(n).run(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"========== $n ==========")
      println(plan)
    }
    spark.stop()
  }
}
