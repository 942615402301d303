package graft

import org.apache.spark.sql.functions._

import graft.extra.{KnLm, Text}

/** The servable KN LM split: seen-path bit-parity with the self-scoring
  * form, the hand-computed OOV backoff cascade, grouped models, and the
  * persisted registry lifecycle.
  */
class KnLmSpec extends SparkSpec {
  import spark.implicits._

  // the TextOpsSpec KN fixture: tri "a b c":3, "b c a":1, "c a b":1;
  // every ctx/cont/mid/uni statistic = 1 except ctx(a,b) = 3; bt = 3;
  // P_uni = 1/3, P_bi = 0.5 everywhere
  private def fixture = Seq(1L -> "a b c", 2L -> "a b c a b c")
    .toDF("doc_id", "text")

  test("scoring the training corpus reproduces kneserNeyScore " +
      "bit-identically (seen-path parity), plain and grouped") {
    val rnd = new scala.util.Random(61)
    val words = (0 until 10).map(i => s"w$i")
    val df = (1L to 80L).map { i =>
      (i, if (i % 3 == 0) "en" else "de",
        (0 until (1 + rnd.nextInt(9)))
          .map(_ => words(rnd.nextInt(10))).mkString(" "))
    }.toDF("doc_id", "lang", "text").repartition(5)
    val self = Text.kneserNeyScore(df, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val served = KnLm.score(df, "doc_id", "text",
      KnLm.fit(df, "text")).collect().map(_.toString).sorted.toSeq
    assert(served == self)
    val selfG = Text.kneserNeyScore(df, "doc_id", "text",
      byCol = Some("lang")).collect().map(_.toString).sorted.toSeq
    val servedG = KnLm.score(df, "doc_id", "text",
      KnLm.fit(df, "text", byCol = Some("lang")))
      .collect().map(_.toString).sorted.toSeq
    assert(servedG == selfG)
  }

  test("OOV backoff cascade, every branch hand-computed") {
    val m = KnLm.fit(fixture, "text")
    def ce(text: String): Double =
      KnLm.score(Seq(9L -> text).toDF("doc_id", "text"),
        "doc_id", "text", m)
        .head().getAs[Double]("cross_entropy")
    // seen trigram: P = 0.875 (the self-scoring fixture value)
    assert(ce("a b c") == 0.133531)
    // unseen trigram, unseen context (b,b), seen bigram (b,c):
    // P = P(c|b) = 0.5
    assert(ce("b b c") == 0.693147)
    // unseen trigram, SEEN context (a,b), unseen bigram (b,b) with
    // seen w2: P = (0 + .75*1*((0 + .75*1*(1/3))/1)) / 3 = 0.0625
    assert(ce("a b b") == 2.772589)
    // unseen w2 (z): bigram level collapses to P_uni(c) = 1/3, and the
    // unseen context (z,z) passes it through
    assert(ce("z z c") == 1.098612)
    // unseen w3 (z): the <unk> floor P_uni = 1/bt = 1/3, then the seen
    // (a,b) context interpolates: same 0.0625 as the a-b-b branch
    assert(ce("a b z") == 2.772589)
    // multi-trigram doc mixes branches: mean of
    // (0.693147, 0.470004, 0.470004, 2.772589) = 1.101436
    assert(ce("b b c a b b") == 1.101436)
  }

  test("scoreProbed ≡ score bit-identically in all three regimes — " +
      "small-model broadcast, big-model/bounded-batch semi-join probe, " +
      "both-big keyed fallback — with OOV at every cascade level, " +
      "plain and grouped") {
    val rnd = new scala.util.Random(67)
    val words = (0 until 8).map(i => s"w$i")
    val train = (1L to 60L).map { i =>
      (i, if (i % 2 == 0) "en" else "de",
        (0 until (3 + rnd.nextInt(8)))
          .map(_ => words(rnd.nextInt(8))).mkString(" "))
    }.toDF("doc_id", "lang", "text").repartition(4)
    // the batch mixes seen text with OOV at every level: unseen
    // trigram/seen ctx, unseen ctx, unseen bigram, unseen w2, unseen w3
    val batch = Seq(
      (101L, "en", "w0 w1 w2 w3 w4"), (102L, "de", "w0 w0 zz w1 w2"),
      (103L, "en", "zz zz zz"), (104L, "de", "w1 qq w2 w3"),
      (105L, "xx", "w0 w1 w2")).toDF("doc_id", "lang", "text")
      .repartition(3)
    for (by <- Seq(None, Some("lang"))) {
      val m = KnLm.fit(train, "text", byCol = by)
      val keyed = KnLm.score(batch, "doc_id", "text", m)
        .collect().map(_.toString).sorted.toSeq
      // default budget → the SMALL-model regime: score's keyed shape
      // verbatim (no per-batch broadcast rebuild), no semi-join probe
      val small = KnLm.scoreProbed(batch, "doc_id", "text", m)
      assert(small.collect().map(_.toString).sorted.toSeq == keyed)
      assert(!small.queryExecution.executedPlan.toString
        .contains("LeftSemi"))
      // budget sized so the model frame is over-cap but the batch's
      // key set is under it → the PROBE regime: model legs filtered
      // by broadcast LeftSemi, then broadcast — still no SMJ
      assert(m.triRows * 144 > 20000L,
        "fixture must exceed the model cap for the probe arm")
      val probed = KnLm.scoreProbed(batch, "doc_id", "text", m,
        probeBudgetBytes = 20000L)
      assert(probed.collect().map(_.toString).sorted.toSeq == keyed)
      val probedPlan = probed.queryExecution.executedPlan.toString
      assert(!probedPlan.contains("SortMergeJoin"))
      assert(probedPlan.contains("LeftSemi"))
      // 16-byte budget: both over-cap → the keyed shape, same values
      val fb = KnLm.scoreProbed(batch, "doc_id", "text", m,
        probeBudgetBytes = 16L)
      assert(fb.collect().map(_.toString).sorted.toSeq == keyed)
    }
    intercept[IllegalArgumentException] {
      KnLm.scoreProbed(batch, "doc_id", "text",
        KnLm.fit(train, "text"), probeBudgetBytes = 0L)
    }
  }

  test("grouped model: a group absent from the model gets a NULL " +
      "cross_entropy (fail-safe — a numeric floor scored the " +
      "least-modeled docs as fluent), and the gate drops it") {
    val m = KnLm.fit(
      Seq((1L, "en", "a b c a b c")).toDF("doc_id", "lang", "text"),
      "text", byCol = Some("lang"))
    val out = KnLm.score(
      Seq((2L, "xx", "a b c")).toDF("doc_id", "lang", "text"),
      "doc_id", "text", m).head()
    assert(out.isNullAt(out.fieldIndex("cross_entropy")))
    assert(out.getAs[Long]("n_trigrams") == 1L)
    // the streaming gate coalesces the NULL verdict to keep = false
    val outDir = java.nio.file.Files.createTempDirectory("knpg").toString
    graft.streaming.PerplexityGate.applyBatch(spark, m, outDir,
      Seq((2L, "xx", "a b c"), (3L, "en", "a b c"))
        .toDF("doc_id", "lang", "text"),
      "doc_id", "text", maxCrossEntropy = 100.0, batchId = 0L)
    val keeps = spark.read.parquet(outDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("keep")).toMap
    assert(keeps == Map(2L -> false, 3L -> true))
  }

  test("save/load round-trips the model (scores identical); re-save " +
      "is a new version with time travel; missing dirs fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("knlm").toString
    val m0 = KnLm.fit(fixture, "text")
    val v1 = KnLm.save(m0, dir)
    assert(v1 == 1L)
    val batch = Seq(7L -> "a b b", 8L -> "a b c").toDF("doc_id", "text")
    val fromFit = KnLm.score(batch, "doc_id", "text", m0)
      .collect().map(_.toString).sorted.toSeq
    val loaded = KnLm.load(spark, dir)
    assert(loaded.discount == 0.75 && loaded.by.isEmpty)
    assert(KnLm.score(batch, "doc_id", "text", loaded)
      .collect().map(_.toString).sorted.toSeq == fromFit)
    // refresh on different data -> new head; old version stays
    val m1 = KnLm.fit(Seq(1L -> "x y z x y z").toDF("doc_id", "text"),
      "text")
    val v2 = KnLm.save(m1, dir)
    assert(v2 == 2L)
    val head = KnLm.load(spark, dir)
    // under the refreshed model "a b c" is fully OOV -> floor path:
    // pUni = 1/3 through the unseen-w2 collapse -> ce = ln 3
    assert(KnLm.score(Seq(9L -> "a b c").toDF("doc_id", "text"),
      "doc_id", "text", head).head().getAs[Double]("cross_entropy")
      == 1.098612)
    assert(KnLm.score(batch, "doc_id", "text",
      KnLm.loadVersion(spark, dir, v1))
      .collect().map(_.toString).sorted.toSeq == fromFit)
    intercept[IllegalStateException] {
      KnLm.load(spark,
        java.nio.file.Files.createTempDirectory("knnone").toString)
    }
  }
}
