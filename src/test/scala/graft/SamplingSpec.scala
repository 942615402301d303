package graft

import org.apache.spark.sql.functions._

import graft.extra.Sampling

/** Deterministic sampling: identical selections at any partitioning —
  * the property rand(seed)-based sampling does NOT have.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is identical across partitionings") {
    val df = spark.range(2000).toDF("id")
    def assign(parts: Int) =
      Sampling.withSplit(df.repartition(parts), "id")
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assign(1) == assign(13))
    val m = assign(7)
    val frac = m.values.count(_ == "train").toDouble / m.size
    assert(frac > 0.75 && frac < 0.85, s"train fraction $frac")
  }

  test("deterministic sample is stable and approximately sized") {
    val df = spark.range(5000).toDF("id")
    val a = Sampling.deterministicSample(df, "id", 0.2)
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(17), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.size > 800 && a.size < 1200, s"sample size ${a.size}")
    // monotone: smaller fraction is a subset of larger
    val c = Sampling.deterministicSample(df, "id", 0.05)
      .select("id").as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("stratified sample: per-class fractions, stable across partitionings") {
    val df = spark.range(6000)
      .select(col("id"), (col("id") % 3).cast("string").as("cls"))
    val fr = Map("0" -> 0.9, "1" -> 0.1)
    def run(parts: Int) =
      Sampling.stratifiedSample(df.repartition(parts), "id", "cls", fr,
        defaultFraction = 0.5)
        .select("id").as[Long].collect().toSet
    val a = run(1)
    assert(a == run(13))
    val byCls = a.groupBy(_ % 3).view.mapValues(_.size.toDouble / 2000).toMap
    assert(byCls(0) > 0.85 && byCls(0) <= 1.0)
    assert(byCls(1) < 0.15)
    assert(byCls(2) > 0.4 && byCls(2) < 0.6)
    // a row's fate depends only on its id-hash and its class fraction:
    // the same id under a bigger fraction stays selected (monotone)
    val all09 = Sampling.stratifiedSample(df, "id", "cls",
      Map("0" -> 0.9, "1" -> 0.9), defaultFraction = 0.9)
      .select("id").as[Long].collect().toSet
    assert(a.subsetOf(all09))
  }

  test("weightedSample: retention tracks the per-row weight, stable " +
      "across partitionings, degenerate weights behave") {
    val df = spark.range(4000)
      .select(col("id"),
        when(col("id") % 2 === 0, 0.9).otherwise(0.1).as("w"))
    def run(parts: Int) =
      Sampling.weightedSample(df.repartition(parts), "id", col("w"))
        .select("id").as[Long].collect().toSet
    val a = run(1)
    assert(a == run(11))
    val hi = a.count(_ % 2 == 0).toDouble / 2000
    val lo = a.count(_ % 2 == 1).toDouble / 2000
    assert(hi > 0.85 && hi < 0.95, s"weight-0.9 retention $hi")
    assert(lo > 0.05 && lo < 0.15, s"weight-0.1 retention $lo")
    assert(Sampling.weightedSample(df, "id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(df, "id", lit(1.0)).count() == 4000)
  }

  test("mixDomains: whole epochs are guaranteed, fractional epoch is " +
      "hash-gated, zero-rate domains vanish, stable across partitionings") {
    val df = spark.range(3000)
      .select(col("id"), (col("id") % 3).cast("string").as("dom"))
    val rates = Map("0" -> 2.5, "1" -> 1.0, "2" -> 0.0)
    def run(parts: Int) =
      Sampling.mixDomains(df.repartition(parts), "id", "dom", rates)
        .select("id", "epoch").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val a = run(1)
    assert(a == run(13))
    val byId = a.groupBy(_._1)
    // dom 0 (ids % 3 == 0): epochs 1 and 2 always present; epoch 3 for
    // roughly half; epochs are contiguous from 1
    val dom0 = byId.filter(_._1 % 3 == 0)
    assert(dom0.nonEmpty && dom0.values.forall { es =>
      val ep = es.map(_._2)
      ep.contains(1L) && ep.contains(2L) && ep.max <= 3L &&
        ep == (1L to ep.max).toSet
    })
    val frac3 = dom0.values.count(_.exists(_._2 == 3L)).toDouble / dom0.size
    assert(frac3 > 0.4 && frac3 < 0.6, s"fractional-epoch rate $frac3")
    // dom 1: rate 1.0 — every row kept with exactly epoch 1
    val dom1 = byId.filter(_._1 % 3 == 1)
    assert(dom1.size == 1000)
    assert(dom1.values.forall(es => es.map(_._2) == Set(1L)))
    // dom 2: rate 0 — absent entirely
    assert(byId.keys.forall(_ % 3 != 2))
  }

  test("interleave_domains: round r of every domain precedes round r+1 " +
      "of any domain — no same-domain runs longer than one per round") {
    val dir = java.nio.file.Files.createTempDirectory("interleave").toString
    (0L until 30L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = graft.queries.Registry.byName("interleave_domains")
      .run(spark, dir)
      .select("source", "domain_rank", "train_pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // global position sorts by (domain_rank, source): every rank-r row
    // precedes every rank-(r+1) row, and within a rank sources ascend
    assert(out.sortBy(_._3).map(x => (x._2, x._1)).toSeq ==
      out.map(x => (x._2, x._1)).sortBy(identity).toSeq)
    // 3 equal domains: each round of 3 consecutive positions holds one
    // doc of each source
    out.groupBy(_._2).values.foreach { round =>
      assert(round.map(_._1).toSet == Set("src0", "src1", "src2"))
      assert(round.map(_._3).max - round.map(_._3).min == 2)
    }
  }

  test("clusterStratifiedSample: per-cluster cap honored, every " +
      "non-empty cluster represented, selection stable across " +
      "partitionings, and the rank window is group-limited") {
    val emb = graft.model.Tables.load(spark, sfDir, "embeddings")
    def sample(parts: Int) = Sampling.clusterStratifiedSample(
        emb.repartition(parts), "vec_id", "embedding",
        numClusters = 16, perCluster = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._3)).toSeq
    val s1 = sample(1)
    assert(s1 == sample(11), "selection must not depend on partitioning")
    // cap per cluster
    val byCluster = s1.groupBy(_._2)
    assert(byCluster.values.forall(_.size <= 5))
    // dense ranks 1..n per cluster
    assert(byCluster.values.forall(g =>
      g.map(_._3).sorted == (1L to g.size.toLong)))
    // every non-empty cluster is represented: clusters present in the
    // full assignment appear in the sample
    val cents = graft.extra.Similarity.sampleCodebook(emb, "vec_id",
      "embedding", 16)
    val allClusters = graft.extra.Similarity.assignClusters(emb,
        "vec_id", "embedding", cents)
      .select("cluster_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(byCluster.keySet == allClusters,
      "a semantic region was crowded out of the sample")
    // scale posture: the rank <= N predicate must push into the window
    // as a group limit (map-side bound, shuffle O(clusters x N))
    val plan = Sampling.clusterStratifiedSample(emb, "vec_id",
        "embedding", 16, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
  }
}
