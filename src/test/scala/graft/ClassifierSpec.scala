package graft

import org.apache.spark.sql.functions._

import graft.extra.Classifier

/** Hand-checked semantics for the multinomial-NB classifier — the
  * oracle gate covers it at corpus scale (`nb_lang_id`,
  * `quality_classifier`); these pin the math and the edge contracts on
  * inputs small enough to verify by hand.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Training set: class a = {"x x y", "x z"}, class b = {"y y z"}.
  // Token counts: a: x=3, y=1, z=1 (tot 5); b: y=2, z=1 (tot 3).
  // Vocab V = {x, y, z} → |V| = 3.
  private def fixture = Seq(
    (1L, "a", "x x y"),
    (2L, "a", "x z"),
    (3L, "b", "y y z")).toDF("doc_id", "label", "text")

  private def lp(num: Double, den: Double): BigDecimal =
    BigDecimal(math.log(num / den)).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("trainNaiveBayes: hand-computed priors, token log-probs, and " +
      "per-class smoothed defaults") {
    val m = Classifier.trainNaiveBayes(fixture, "label", "text")
    val cs = m.classStats.collect()
      .map(r => r.getString(0) -> (r.getDecimal(1), r.getDecimal(2))).toMap
    assert(BigDecimal(cs("a")._1) == lp(2.0, 3.0)) // prior a = 2/3
    assert(BigDecimal(cs("b")._1) == lp(1.0, 3.0)) // prior b = 1/3
    assert(BigDecimal(cs("a")._2) == lp(1.0, 8.0)) // 1/(5+3)
    assert(BigDecimal(cs("b")._2) == lp(1.0, 6.0)) // 1/(3+3)
    val t = m.tokenLp.collect()
      .map(r => (r.getString(0), r.getString(1)) -> BigDecimal(r.getDecimal(2)))
      .toMap
    assert(t.size == 5) // observed (label, token) pairs only
    assert(t(("a", "x")) == lp(4.0, 8.0)) // (3+1)/(5+3)
    assert(t(("a", "y")) == lp(2.0, 8.0))
    assert(t(("a", "z")) == lp(2.0, 8.0))
    assert(t(("b", "y")) == lp(3.0, 6.0))
    assert(t(("b", "z")) == lp(2.0, 6.0))
    assert(!t.contains(("b", "x"))) // unseen-in-class → default_lp path
  }

  test("scoreNaiveBayes: evidence sums are exact decimal products; " +
      "unseen-in-class tokens take the class default; out-of-vocab " +
      "tokens are ignored") {
    val m = Classifier.trainNaiveBayes(fixture, "label", "text")
    // "x q": q is out-of-vocab (never trained) → only x scores;
    // class b never saw x → default_lp(b).
    val scored = Classifier.scoreNaiveBayes(
      Seq((9L, "x q")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().map(r => r.getString(1) ->
        (BigDecimal(r.getDecimal(2)), r.getLong(3))).toMap
    assert(scored("a")._2 == 1L) // one in-vocab occurrence
    assert(scored("a")._1 == lp(2.0, 3.0) + lp(4.0, 8.0))
    assert(scored("b")._1 == lp(1.0, 3.0) + lp(1.0, 6.0))
  }

  test("predictNaiveBayes: argmax class; repeated tokens multiply " +
      "evidence (multinomial, not bernoulli)") {
    val m = Classifier.trainNaiveBayes(fixture, "label", "text")
    val out = Classifier.predictNaiveBayes(
      Seq((10L, "x x"), (11L, "y y y")).toDF("doc_id", "text"),
      "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 10: a = ln(2/3)+2·ln(4/8) > b = ln(1/3)+2·ln(1/6) → a
    // doc 11: b = ln(1/3)+3·ln(3/6) beats a = ln(2/3)+3·ln(2/8) → b
    assert(out == Map(10L -> "a", 11L -> "b"))
  }

  test("zero-token and null-text docs score on priors alone and " +
      "predict the max-prior class") {
    val m = Classifier.trainNaiveBayes(fixture, "label", "text")
    val scored = Classifier.scoreNaiveBayes(
      Seq((20L, ""), (21L, null: String))
        .toDF("doc_id", "text"), "doc_id", "text", m)
    val rows = scored.collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (BigDecimal(r.getDecimal(2)), r.getLong(3))).toMap
    assert(rows.size == 4) // both docs keep a row per class
    assert(rows((20L, "a")) == ((lp(2.0, 3.0), 0L)))
    assert(rows((21L, "b")) == ((lp(1.0, 3.0), 0L)))
    val pred = Classifier.predictNaiveBayes(
      Seq((20L, "")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head.getString(1)
    assert(pred == "a") // ln(2/3) > ln(1/3)
  }

  test("exact-tie predictions break to the ascending label") {
    // Symmetric corpus: classes p/q are mirror images → scoring "k"
    // (out-of-vocab) leaves identical priors and zero evidence.
    val m = Classifier.trainNaiveBayes(
      Seq((1L, "p", "s t"), (2L, "q", "t s")).toDF("doc_id", "label", "text"),
      "label", "text")
    val pred = Classifier.predictNaiveBayes(
      Seq((30L, "k")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head.getString(1)
    assert(pred == "p")
  }

  test("null training labels are excluded from the model but such " +
      "docs still score") {
    val df = Seq((1L, Some("a"), "x x y"), (2L, Some("a"), "x z"),
      (3L, Some("b"), "y y z"), (4L, None, "x y z"))
      .map { case (i, l, t) => (i, l.orNull, t) }
      .toDF("doc_id", "label", "text")
    val m = Classifier.trainNaiveBayes(df, "label", "text")
    val m0 = Classifier.trainNaiveBayes(fixture, "label", "text")
    // model identical to the 3-doc fixture's
    assert(m.classStats.collect().toSet == m0.classStats.collect().toSet)
    assert(m.tokenLp.collect().toSet == m0.tokenLp.collect().toSet)
    assert(Classifier.scoreNaiveBayes(df, "doc_id", "text", m)
      .where(col("doc_id") === 4L).count() == 2)
  }

  test("a class whose training docs carry zero tokens keeps its row " +
      "and its prior (review fix: the ct inner join dropped it)") {
    val m = Classifier.trainNaiveBayes(
      Seq((1L, "empty", ""), (2L, "full", "x y"), (3L, "full", "x"))
        .toDF("doc_id", "label", "text"), "label", "text")
    val cs = m.classStats.collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(1))).toMap
    assert(cs.keySet == Set("empty", "full"))
    assert(cs("empty") == lp(1.0, 3.0)) // 1 of 3 docs — prior kept
    assert(cs("full") == lp(2.0, 3.0))
    // an out-of-vocab doc decides on priors: 'full' wins
    val pred = Classifier.predictNaiveBayes(
      Seq((9L, "zzz")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head.getString(1)
    assert(pred == "full")
    // degenerate: EVERY class token-free — finite model, priors-only
    // scoring still works
    val m0 = Classifier.trainNaiveBayes(
      Seq((1L, "a", ""), (2L, "b", ""), (3L, "b", ""))
        .toDF("doc_id", "label", "text"), "label", "text")
    val p0 = Classifier.predictNaiveBayes(
      Seq((9L, "zzz")).toDF("doc_id", "text"), "doc_id", "text", m0)
      .collect().head.getString(1)
    assert(p0 == "b")
  }

  test("save/load round-trips the model exactly; re-save is a new " +
      "version and loadVersion time-travels across model refreshes") {
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    val m0 = Classifier.trainNaiveBayes(fixture, "label", "text")
    val v1 = Classifier.save(m0, dir)
    assert(v1 == 1L)
    val loaded = Classifier.load(spark, dir)
    assert(loaded.classStats.collect().toSet ==
      m0.classStats.collect().toSet)
    assert(loaded.tokenLp.collect().toSet == m0.tokenLp.collect().toSet)
    val docs = Seq((10L, "x x"), (11L, "y y y")).toDF("doc_id", "text")
    assert(Classifier.predictNaiveBayes(docs, "doc_id", "text", loaded)
      .collect().toSet ==
      Classifier.predictNaiveBayes(docs, "doc_id", "text", m0)
        .collect().toSet)
    // model refresh: retrain on different data → new head; the old
    // version stays loadable (keepVersions default 2) and keeps its
    // verdicts
    val m1 = Classifier.trainNaiveBayes(
      Seq((1L, "a", "y y"), (2L, "b", "x x x")).toDF(
        "doc_id", "label", "text"), "label", "text")
    val v2 = Classifier.save(m1, dir)
    assert(v2 == 2L)
    val head = Classifier.load(spark, dir)
    val old = Classifier.loadVersion(spark, dir, v1)
    val p = (m: Classifier.NaiveBayesModel) =>
      Classifier.predictNaiveBayes(docs, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p(head) == Map(10L -> "b", 11L -> "a")) // flipped classes
    assert(p(old) == Map(10L -> "a", 11L -> "b"))
    // loading a missing frame/dir fails loudly
    val e = intercept[IllegalStateException] {
      Classifier.load(spark,
        java.nio.file.Files.createTempDirectory("nbnone").toString)
    }
    assert(e.getMessage.contains("no committed"))
  }

  test("classifyTyped: randomized differential vs the batch argmax — " +
      "identical predicted labels and round-6 scores, passthrough " +
      "columns preserved") {
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 30).map(i => s"w$i")
    val mk = () => (0 until (1 + rnd.nextInt(12))).map { _ =>
      if (rnd.nextInt(8) == 0) s"oov${rnd.nextInt(50)}" // out-of-vocab
      else vocab(rnd.nextInt(vocab.size))
    }.mkString(if (rnd.nextBoolean()) " " else "  ") // multi-space too
    val train = (1L to 80L).map(i =>
      (i, if (i % 3 == 0) "hi" else "lo", mk())).toDF(
      "doc_id", "label", "text")
    val m = Classifier.trainNaiveBayes(train, "label", "text")
    val score = (100L to 160L).map(i => (i, mk(), s"src${i % 4}")) ++
      Seq((500L, "", "srcE"), (501L, null: String, "srcN"),
        (502L, "oov1 oov2", "srcO"))
    val df = score.toDF("doc_id", "text", "source").repartition(7)
    val batch = Classifier.predictNaiveBayes(df, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2))).toMap
    val typedOut = Classifier.classifyTyped(df, "text", m)
    assert(typedOut.columns.toSeq ==
      Seq("doc_id", "text", "source", "predicted", "score"))
    val typed = typedOut.collect().map(r => r.getLong(0) ->
      (r.getString(3), r.getDouble(4))).toMap
    assert(typed == batch)
  }

  test("scores are partitioning-independent (exact decimal sums)") {
    val base = (1L to 60L).map { i =>
      val lab = if (i % 3 == 0) "hi" else "lo"
      (i, lab, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} common tok$i")
    }
    val df1 = base.toDF("doc_id", "label", "text")
    val df8 = df1.repartition(8)
    val m1 = Classifier.trainNaiveBayes(df1, "label", "text")
    val m8 = Classifier.trainNaiveBayes(df8, "label", "text")
    val s1 = Classifier.scoreNaiveBayes(df1, "doc_id", "text", m1)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDecimal(2))
      .toMap
    val s8 = Classifier.scoreNaiveBayes(df8.repartition(13), "doc_id",
      "text", m8)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDecimal(2))
      .toMap
    assert(s1 == s8)
  }
}
