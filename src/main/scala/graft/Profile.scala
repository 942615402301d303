package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries (builder tooling). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    import graft.extra.{Dedup, Text}
    import graft.model.Tables
    val docs = Tables.load(spark, dir, "documents")
    time("docs scan")(docs.count())
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("t"))
    time("tokens")(toks.count())
    time("tokens.force")(toks.select(explode(col("t"))).count())
    val sets = docs.select(col("doc_id"), Text.shingles(col("text"), 3).as("shingles"))
    time("shingles.force")(sets.select(explode(col("shingles"))).count())
    val inv = sets.select(col("doc_id"), size(col("shingles")).as("n"),
      explode(col("shingles")).as("shingle"))
    time("inv+md5")(inv.select(md5(col("shingle"))).count())
    val docFreq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("docFreq")(docFreq.count())
    val full = Dedup.ngramJaccard(docs, "doc_id", "text")
    time("ngram_jaccard full")(full.count())
    // --- ngram stage breakdown (mirrors Dedup.ngramJaccard internals) ---
    locally {
      import org.apache.spark.sql.expressions.Window
      val sets = Text.withShingles(docs, "text", 3)
        .select(col("doc_id"), col("shingles"))
      val inv = sets.select(col("doc_id"), size(col("shingles")).as("n"),
        explode(col("shingles")).as("shingle"))
      val dfq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
      val prefix = inv.join(dfq, "shingle")
        .withColumn("pos", row_number().over(w))
        .filter(col("pos") <= col("n") - ceil(col("n") * 0.5) + 1)
        .select(col("doc_id"), col("shingle"))
      time("  ng.prefix")(prefix.count())
      val a = prefix.select(col("doc_id").as("id_a"), col("shingle"))
      val b = prefix.select(col("doc_id").as("id_b"), col("shingle"))
      val cand = a.join(b, "shingle").filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      time("  ng.cand")(cand.count())
      val verify = cand
        .join(sets.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
        .join(sets.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      time("  ng.verify")(verify.filter(col("inter") > 0).count())
    }
    time("fingerprint")(Text.withFingerprint(docs, "text").count())
    val mh = Dedup.minhash(docs, "doc_id", "text", 16, 3)
    time("minhash wide")(mh.count())
    time("neardup_minhash full")(Dedup.nearDupMinhash(docs, "doc_id", "text").count())
    spark.stop()
  }
}
