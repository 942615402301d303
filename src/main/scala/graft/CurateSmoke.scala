package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Curation scale smoke: run the full end-to-end curation pipeline
  * (quality → lang → exact dedup → MinHash near-dup components → split)
  * over a generated corpus orders of magnitude beyond the test tables,
  * printing wall time, docs/sec, and the verdict histogram.
  *
  * The synthetic corpus is deterministic and plants both duplicate
  * kinds: within each 20-doc block, doc 19 is an exact copy of doc 18's
  * text and doc 18 appends one word to doc 17's — so exact_dup and
  * near_dup rates are known at any size. Every 5th token is an English
  * stopword so the quality/language gates pass for the base docs.
  *
  * Usage: runMain graft.CurateSmoke [nDocs]
  */
object CurateSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def textFor(src: org.apache.spark.sql.Column) = {
      val stop = array(graft.extra.Text.stopwords("en").map(lit): _*)
      concat_ws(" ", transform(sequence(lit(0), lit(29)), j =>
        when(j % 5 === 0,
          element_at(stop, (pmod(xxhash64(src * 7L + j), lit(8L)) + 1).cast("int")))
          .otherwise(concat(lit("w"),
            pmod(xxhash64(src * 1000003L + j), lit(50000L))))))
    }
    def corpus(rows: Long) = {
      val base = spark.range(rows).select(col("id").as("doc_id"))
      // block of 20: doc 17 is the base text, doc 18 = base + one word
      // (near dup), doc 19 = exact copy of doc 17
      val blockBase = col("doc_id") - (col("doc_id") % 20)
      val src = when(col("doc_id") % 20 >= 18, blockBase + 17)
        .otherwise(col("doc_id"))
      base.select(col("doc_id"),
        when(col("doc_id") % 20 === 18,
          concat(textFor(src), lit(" extradiffword")))
          .otherwise(textFor(src)).as("text"))
    }

    // warmup at 1/100 scale
    graft.extra.Curation.curate(corpus(math.max(n / 100, 100)),
      "doc_id", "text").count()
    val t0 = System.nanoTime()
    val verdicts = graft.extra.Curation.curate(corpus(n), "doc_id", "text")
    val hist = verdicts.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wall = (System.nanoTime() - t0) / 1e9
    val histJson = hist.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"curate_smoke","n_docs":$n,"wall_s":$wall,""" +
      s""""docs_per_sec":${(n / wall).toLong},"statuses":$histJson}""")
    spark.stop()
  }
}
