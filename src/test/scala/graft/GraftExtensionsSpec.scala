package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The spark.sql.extensions deployment hook: SQL-surface access to the
  * custom codegen expressions and planner strategy, idempotent on a
  * live session.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("registerAll exposes graft_dot to spark.sql and injects the " +
      "as-of strategy; double registration is a no-op") {
    GraftExtensions.registerAll(spark)
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), " +
        "array(4.0d, 5.0d, 6.0d)) AS d").head().getDouble(0)
    assert(r == 32.0)
    // folds the shorter length; a null ELEMENT nulls the result (the
    // expression's documented contract)
    assert(spark.sql(
      "SELECT graft_dot(array(1.0d), array(1.0d, 2.0d)) AS d")
      .head().getDouble(0) == 1.0)
    assert(spark.sql(
      "SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), " +
        "array(1.0d, 2.0d)) AS d").head().isNullAt(0))
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.AsOfStrategy) == 1)
    // registry path (expr(...) from the Column API) resolves too
    import org.apache.spark.sql.functions.expr
    val viaExpr = spark.range(1)
      .select(expr("graft_dot(array(2.0d, 2.0d), array(3.0d, 3.0d))"))
      .head().getDouble(0)
    assert(viaExpr == 12.0)
  }

  test("graft_snapshot TVF: SQL time travel over a snapshot table, " +
      "composable in joins; literal-argument contract enforced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("tvfsnap").toString
    graft.extra.Snapshots.init(spark.range(20)
      .select(col("id"), concat(lit("d"), col("id")).as("text")),
      dir, "id", 2)
    graft.extra.Snapshots.upsert(spark,
      dir, Seq((1L, "d1-v2")).toDF("id", "text"), "id")

    assert(spark.sql(s"SELECT count(*) FROM graft_snapshot('$dir')")
      .head().getLong(0) == 20L)
    // explicit version: v0 still serves the original row
    assert(spark.sql(
      s"SELECT text FROM graft_snapshot('$dir', 0) WHERE id = 1")
      .head().getString(0) == "d1")
    assert(spark.sql(
      s"SELECT text FROM graft_snapshot('$dir', 1) WHERE id = 1")
      .head().getString(0) == "d1-v2")
    // composes like any relation: self-join across versions = the
    // SQL spelling of a version diff probe
    val changed = spark.sql(
      s"""SELECT a.id FROM graft_snapshot('$dir', 0) a
         |JOIN graft_snapshot('$dir', 1) b ON a.id = b.id
         |WHERE a.text <> b.text""".stripMargin)
    assert(changed.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // non-literal arguments are rejected at analysis
    intercept[Exception] {
      spark.sql(
        s"SELECT * FROM range(1), LATERAL graft_snapshot('$dir', id)")
        .collect()
    }
  }

  test("graft_asof TVF: the native as-of join reachable from SQL over " +
      "registered views, backward default + forward/tolerance args") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    Seq((1L, "s", 100.0), (5L, "s", 101.0))
      .toDF("ts", "sym", "px").createOrReplaceTempView("trades_tvf")
    Seq((0L, "s", 99.0), (4L, "s", 99.5), (9L, "s", 98.0))
      .toDF("ts", "sym", "bid").createOrReplaceTempView("quotes_tvf")
    val back = spark.sql(
      "SELECT ts, asof_bid FROM graft_asof('trades_tvf', 'quotes_tvf', " +
        "'sym', 'ts', 'bid') ORDER BY ts")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(back == Seq((1L, 99.0), (5L, 99.5)))
    val fwd = spark.sql(
      "SELECT ts, asof_bid FROM graft_asof('trades_tvf', 'quotes_tvf', " +
        "'sym', 'ts', 'bid', 'forward') ORDER BY ts")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fwd == Seq((1L, 99.5), (5L, 98.0)))
    // tolerance nulls stale matches: backward from ts=5 reaches ts=4
    // (gap 1 <= 2) but ts=1's nearest (ts=0) misses a 0-second bound
    val tol = spark.sql(
      "SELECT ts, asof_bid FROM graft_asof('trades_tvf', 'quotes_tvf', " +
        "'sym', 'ts', 'bid', 'backward', 2) ORDER BY ts").collect()
    assert(tol(0).isNullAt(1) == false && tol(0).getDouble(1) == 99.0)
    assert(tol(1).getDouble(1) == 99.5)
    // the plan actually runs the custom operator
    val plan = spark.sql(
      "SELECT * FROM graft_asof('trades_tvf', 'quotes_tvf', 'sym', " +
        "'ts', 'bid')").queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native exec missing:\n$plan")
  }

  test("graft_bm25 TVF: persisted-index search from SQL, composable " +
      "in joins") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("tvfbm25").toString
    val docs = Seq(
      (0L, "spark shuffles data across executors"),
      (1L, "spark spark spark tuning guide"),
      (2L, "cooking pasta with garlic")).toDF("doc_id", "text")
    graft.extra.Bm25Index.build(docs, "doc_id", "text", s"$dir/idx",
      numFiles = 2)
    val hits = spark.sql(
      s"SELECT id, n_hits, score FROM graft_bm25('$dir/idx', 'spark', 2)")
      .collect()
    assert(hits.length == 2)
    assert(hits.head.getLong(0) == 1L, "tf-heaviest doc must rank first")
    // composes: join the hits back to a docs view for display text
    docs.createOrReplaceTempView("docs_tvf")
    val joined = spark.sql(
      s"""SELECT d.text FROM graft_bm25('$dir/idx', 'pasta') h
         |JOIN docs_tvf d ON d.doc_id = h.id""".stripMargin).collect()
    assert(joined.map(_.getString(0)).toSeq ==
      Seq("cooking pasta with garlic"))
  }

  test("graft_dedup_spans TVF: span dedup over a registered view, " +
      "k and minSpanTokens arguments honored") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "x1 the quick brown fox jumps over the lazy dog x2"),
      (2L, "completely unrelated words with nothing shared here at all"))
      .toDF("doc_id", "text").createOrReplaceTempView("dedup_tvf")
    val out = spark.sql(
      "SELECT doc_id, n_tokens_removed FROM graft_dedup_spans(" +
        "'dedup_tvf', 'doc_id', 'text', 5) ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out(0) == ((0L, 0L)), "canonical copy must survive")
    assert(out(1)._2 > 0L, "the repeated run must be cut from doc 1")
    assert(out(2) == ((2L, 0L)))
    // a minSpanTokens above the run length spares it
    val spared = spark.sql(
      "SELECT sum(n_tokens_removed) FROM graft_dedup_spans(" +
        "'dedup_tvf', 'doc_id', 'text', 5, 50)").head().getLong(0)
    assert(spared == 0L)
  }

  test("graft_neardup and graft_dedup_spans_inc TVFs: the persisted " +
      "incremental-dedup indexes reachable from SQL") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val base = java.nio.file.Files.createTempDirectory("tvfinc").toString
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight again"),
      (1L, "unrelated corpus words nothing shared with anything else"))
      .toDF("doc_id", "text")
    graft.extra.MinhashIndex.build(corpus, "doc_id", "text", s"$base/mh")
    graft.extra.SubstrIndex.build(corpus, "doc_id", "text",
      s"$base/sub", k = 5)
    Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight folks"),
      (101L, "totally clean new batch document with fresh words only"))
      .toDF("doc_id", "text").createOrReplaceTempView("batch_tvf")
    val nd = spark.sql(
      s"""SELECT doc_id, is_dup, dup_of
         |FROM graft_neardup('$base/mh', 'batch_tvf', 'doc_id', 'text')
         |ORDER BY doc_id""".stripMargin).collect()
    assert(nd(0).getBoolean(1) && nd(0).getLong(2) == 0L)
    assert(!nd(1).getBoolean(1))
    val sd = spark.sql(
      s"""SELECT doc_id, n_tokens_removed
         |FROM graft_dedup_spans_inc('$base/sub', 'batch_tvf',
         |                           'doc_id', 'text')
         |ORDER BY doc_id""".stripMargin).collect()
    assert(sd(0).getLong(1) > 0L, "the repeated run must be cut")
    assert(sd(1).getLong(1) == 0L)
    // minSpanTokens literal flows through and spares the run
    val spared = spark.sql(
      s"""SELECT sum(n_tokens_removed) FROM graft_dedup_spans_inc(
         |  '$base/sub', 'batch_tvf', 'doc_id', 'text', 50)""".stripMargin)
      .head().getLong(0)
    assert(spared == 0L)
  }

  test("graft_semdedup TVF: the persisted semantic index reachable " +
      "from SQL, threshold literal flowing through") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("tvfsem").toString
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
      .toDF("doc_id", "embedding")
    graft.extra.SemanticIndex.build(corpus, "doc_id", "embedding", dir)
    Seq((100L, Seq(0.99f, 0.01f, 0f, 0f)), (101L, Seq(0f, 0f, 1f, 0f)))
      .toDF("doc_id", "embedding")
      .createOrReplaceTempView("sem_batch_tvf")
    val v = spark.sql(
      s"""SELECT doc_id, is_dup, dup_of
         |FROM graft_semdedup('$dir', 'sem_batch_tvf', 'doc_id',
         |                    'embedding', 0.95D)
         |ORDER BY doc_id""".stripMargin).collect()
    assert(v(0).getBoolean(1) && v(0).getLong(2) == 0L)
    assert(!v(1).getBoolean(1))
    // a stricter threshold spares the near-copy
    val strict = spark.sql(
      s"""SELECT count(*) FILTER (WHERE is_dup)
         |FROM graft_semdedup('$dir', 'sem_batch_tvf', 'doc_id',
         |                    'embedding', 0.9999999D)""".stripMargin)
      .head().getLong(0)
    assert(strict == 0L)
  }

  test("graft_ann TVF: query-by-literal-vector over a persisted " +
      "IVF-PQ index from SQL") {
    import org.apache.spark.sql.functions._
    GraftExtensions.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("tvfann").toString
    val emb = graft.model.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 200)
    graft.extra.AnnIndex.buildAndWriteIvfPq(emb, "vec_id", "embedding",
      dir, numCentroids = 8, m = 8, pqCentroids = 8)
    // query with corpus vector 7's own embedding: rank 1 must be 7
    // with cosine 1.0 (query-by-vector has no self-exclusion)
    val v7 = emb.filter(col("vec_id") === 7).head()
      .getSeq[Float](1).map(x => f"${x.toDouble}%.8fd").mkString(", ")
    val hits = spark.sql(
      s"""SELECT rank, neighbor_id, cosine
         |FROM graft_ann('$dir', array($v7), 3)
         |ORDER BY rank""".stripMargin).collect()
    assert(hits.length == 3)
    assert(hits.head.getLong(1) == 7L && hits.head.getDouble(2) == 1.0)
    // a non-literal vector is rejected at analysis
    intercept[Exception] {
      spark.sql(s"SELECT * FROM range(1), " +
        s"LATERAL graft_ann('$dir', array(CAST(id AS DOUBLE)), 3)")
        .collect()
    }
  }

  test("graft_index_stats TVF: the segment ladder + ledger of a " +
      "manifest-committed index from SQL; zero rows for an " +
      "uncommitted path") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("ext_stats")
      .toString
    graft.extra.SubstrIndex.build(
      Seq((0L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text"), "doc_id", "text", dir, k = 5,
      hashed = true)
    graft.extra.SubstrIndex.append(
      Seq((1L, "one appended doc with fresh words w1 w2 w3"))
        .toDF("doc_id", "text"), "doc_id", "text", dir,
      txn = Some(("s", 0L)))
    val rows = spark.sql(
      s"SELECT frame, segment, bytes, files FROM " +
        s"graft_index_stats('$dir') ORDER BY frame, segment").collect()
    val grams = rows.filter(_.getString(0) == "grams")
    assert(grams.length == 2, s"expected 2 gram segments: ${rows.toSeq}")
    assert(grams.forall(r => r.getLong(2) > 0L && r.getLong(3) > 0L))
    val txn = rows.filter(_.getString(0) == "_txn")
    assert(txn.map(_.getString(1)).toSeq == Seq("s:0"))
    assert(txn.forall(r => r.isNullAt(2) && r.isNullAt(3)))
    // joins/aggregates compose like any table: total live bytes
    assert(spark.sql(s"SELECT sum(bytes) FROM graft_index_stats('$dir')")
      .head().getLong(0) > 0L)
    // uncommitted path: zero rows, no throw
    val empty = java.nio.file.Files.createTempDirectory("ext_nostats")
      .toString
    assert(spark.sql(s"SELECT * FROM graft_index_stats('$empty')")
      .count() == 0L)
  }

  test("graft_classify TVF: persisted-model classification from SQL " +
      "in both modes; unknown mode rejected") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("ext_nb").toString
    val train = Seq((1L, "spam", "buy cheap pills now"),
      (2L, "spam", "cheap pills cheap deals"),
      (3L, "ham", "meeting notes for tuesday"),
      (4L, "ham", "notes on the quarterly review"))
      .toDF("doc_id", "label", "text")
    graft.extra.Classifier.save(
      graft.extra.Classifier.trainNaiveBayes(train, "label", "text"), dir)
    Seq((10L, "cheap pills"), (11L, "quarterly meeting notes"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_nb_docs")
    val pred = spark.sql(
      s"SELECT doc_id, predicted FROM graft_classify('$dir', " +
        "'ext_nb_docs', 'doc_id', 'text') ORDER BY doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(10L -> "spam", 11L -> "ham"))
    // scores mode: one row per (doc, class), exact decimals
    val n = spark.sql(
      s"SELECT count(*) FROM graft_classify('$dir', 'ext_nb_docs', " +
        "'doc_id', 'text', 'scores')").head().getLong(0)
    assert(n == 4L)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_classify('$dir', 'ext_nb_docs', " +
        "'doc_id', 'text', 'bogus')").collect()
    }
    assert(e.getMessage.contains("mode must be"))
  }

  test("graft_bpe_count TVF: persisted-tokenizer subword counts from " +
      "SQL; argument arity enforced") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("ext_bpe").toString
    graft.extra.BpeModel.save(spark,
      Seq(("a", "b"), ("ab", "c")), dir)
    Seq((1L, "abc ab a"), (2L, ""))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_bpe_docs")
    val rows = spark.sql(
      s"SELECT * FROM graft_bpe_count('$dir', 'ext_bpe_docs', " +
        "'doc_id', 'text') ORDER BY doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // "abc ab a" → [abc][ab][a] = 3 subwords over 3 words
    assert(rows.toSeq == Seq((1L, 3L, 3L), (2L, 0L, 0L)))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bpe_count('$dir', " +
        "'ext_bpe_docs', 'doc_id')").collect()
    }
    assert(e.getMessage.contains("expects"))
  }

  test("graft_perplexity TVF: persisted-KN-LM scoring from SQL with " +
      "OOV backoff; arity enforced") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("ext_kn").toString
    graft.extra.KnLm.save(graft.extra.KnLm.fit(
      Seq(1L -> "a b c", 2L -> "a b c a b c").toDF("doc_id", "text"),
      "text"), dir)
    Seq((10L, "a b c"), (11L, "b b c"), (12L, "x"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_kn_docs")
    val rows = spark.sql(
      s"SELECT * FROM graft_perplexity('$dir', 'ext_kn_docs', " +
        "'doc_id', 'text') ORDER BY doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // KnLmSpec's hand-computed fixture values; the 1-token doc drops
    assert(rows.toSeq ==
      Seq((10L, 1L, 0.133531), (11L, 1L, 0.693147)))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_perplexity('$dir', " +
        "'ext_kn_docs', 'doc_id')").collect()
    }
    assert(e.getMessage.contains("expects"))
  }

  test("the extensions class itself wires a SparkSessionExtensions " +
      "instance without error (spark.sql.extensions contract)") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
