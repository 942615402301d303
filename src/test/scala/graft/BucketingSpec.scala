package graft

import org.apache.spark.sql.functions._

/** Bucketing: co-located joins with NO exchange — the pre-partitioning
  * pattern for repeated large-fact joins at scale (SURVEY §2.1 note on
  * bucketing / brief's "bucketing for co-located joins").
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact/dim tables sort-merge join without any shuffle") {
    val li = graft.model.Tables.load(spark, sfDir, "lineitem")
    val o = graft.model.Tables.load(spark, sfDir, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val planStr = j.queryExecution.executedPlan.toString
      // the join itself must be exchange-free (bucket co-location);
      // only the final single-column groupBy may shuffle
      val joinPart = planStr.split("HashAggregate").last
      assert(!joinPart.contains("Exchange"),
        s"bucketed join should not shuffle:\n$planStr")
      val direct = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect().toSeq
      assert(j.orderBy("o_orderstatus").collect().toSeq == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
