package graft

import org.apache.spark.sql.functions._

import graft.extra.{Dedup, Text}

/** Hand-computed expectations for the dedup family. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactByKey keeps min order-col and counts copies") {
    val df = Seq(("a", 3L), ("a", 1L), ("b", 2L)).toDF("k", "id")
    val out = Dedup.exactByKey(df, Seq("k"), "id")
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 1L, 2L), ("b", 2L, 1L)))
  }

  test("latestWins keeps newest row per key with tie-break") {
    val df = Seq(
      ("u1", "2024-01-02 00:00:00", 1L, "old"),
      ("u1", "2024-01-03 00:00:00", 2L, "new"),
      ("u2", "2024-01-01 00:00:00", 3L, "only"))
      .toDF("k", "ts", "id", "tag")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Dedup.latestWins(df, Seq("k"), "ts", "id")
      .orderBy("k").select("tag").as[String].collect()
    assert(out.toSeq == Seq("new", "only"))
  }

  test("identical texts get identical minhash signatures; disjoint don't") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "completely different words about spark catalyst engines here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhash(df, "doc_id", "text", numPerms = 8, shingleN = 3)
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("nearDupMinhash finds the duplicated pair with jaccard 1.0") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "z y x w v u t s r q"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDupMinhash(df, "doc_id", "text").collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("simhash: identical docs equal, near-identical docs close in bits") {
    val df = Seq(
      (1L, "spark catalyst optimizer rules rewrite logical plans nightly"),
      (2L, "spark catalyst optimizer rules rewrite logical plans nightly"),
      (3L, "spark catalyst optimizer rules rewrite logical plans daily"))
      .toDF("doc_id", "text")
    val m = Dedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) <= 8)
  }

  test("embeddingNearDup: parallel vectors cos=1, orthogonal excluded") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(df, "vec_id", "embedding", 0.9)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getDouble(2) == 1.0)
  }

  test("shingles guard: short texts yield empty array not backwards seq") {
    val df = Seq((1L, "one two")).toDF("doc_id", "text")
    val sh = df.select(Text.shingles(col("text"), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(sh.isEmpty)
  }

  test("embeddingNearDupLsh ⊆ all-pairs baseline with useful recall (sf0.001)") {
    val emb = graft.model.Tables.load(spark, sfDir, "embeddings")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val exact = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.4)
      .collect().map(key).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", 0.4)
      .collect().map(key).toSet
    // every LSH pair is verified with the exact cosine → zero false positives
    assert(lsh.subsetOf(exact), (lsh -- exact).take(5).toString)
    assert(exact.nonEmpty)
    // 4 tables × 4 bits on near-orthogonal random vectors: expect a real
    // fraction of the true pairs, not an empty result
    assert(lsh.size >= exact.size / 5, s"recall ${lsh.size}/${exact.size}")
  }

  test("nearDupIncremental: verdicts for batch docs only — corpus dup " +
      "found, within-batch dup oriented at the higher id, clean doc clean") {
    val base = "the quick brown fox jumps over the lazy dog near the river"
    val corpus = Seq(
      100L -> base,
      101L -> "completely unrelated corpus content about spark catalyst plans")
      .toDF("doc_id", "text")
    val batch = Seq(
      200L -> (base + " tonight"),                   // near-dup of corpus 100
      201L -> "fresh batch words never seen before in any other document here",
      202L -> "fresh batch words never seen before in any other document here too",
      203L -> "totally clean singleton with its own vocabulary entirely")
      .toDF("doc_id", "text")
    val out = Dedup.nearDupIncremental(corpus, batch, "doc_id", "text",
      threshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out.keySet == Set(200L, 201L, 202L, 203L)) // batch rows only
    assert(out(200L) == (true, 100L))  // dups the corpus canonical
    assert(out(201L) == (false, -1L))  // lower batch id stays canonical
    assert(out(202L) == (true, 201L))  // higher id dups its batch-mate
    assert(out(203L) == (false, -1L))
  }

  test("semDedup keeps the min-id representative of each within-cluster " +
      "similar group, independent of partitioning") {
    val df = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),   // 0 and 1 identical: cos = 1
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),   // orthogonal to everything kept
      (3L, Array(0.5f, 0.5f, 0f, 0f))) // cos(0,3) ≈ 0.707 < threshold
      .toDF("vec_id", "embedding")
    val kept = Dedup.semDedup(df, "vec_id", "embedding",
      threshold = 0.95, numClusters = 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L))
    val keptRepart = Dedup.semDedup(df.repartition(7), "vec_id", "embedding",
      threshold = 0.95, numClusters = 2)
      .select("id").as[Long].collect().toSet
    assert(keptRepart == kept)
  }

  test("semDedup drops a strict subset: keepers + dropped partition the " +
      "corpus, and every dropped vector has a kept lower-id near-dup in " +
      "its cluster (sf0.001)") {
    val emb = graft.model.Tables.load(spark, sfDir, "embeddings")
    val all = emb.select("vec_id").as[Long].collect().toSet
    val kept = Dedup.semDedup(emb, "vec_id", "embedding",
      threshold = 0.4, numClusters = 16)
      .select("id").as[Long].collect().toSet
    assert(kept.subsetOf(all) && kept.nonEmpty)
    // min id can never be dropped: it has no lower-id neighbor
    assert(kept.contains(all.min))
  }

  test("hot LSH buckets are capped: pathological identical corpus stays bounded") {
    val boiler = (1L to 60L).map(i => (i, "a b c d e f g h i j"))
    val df = boiler.toDF("doc_id", "text")
    // every doc lands in the same (band,sig) bucket in every band: width
    // 60 > maxBucket 50 → dropped, so candidate generation yields nothing
    val capped = Dedup.nearDupMinhash(df, "doc_id", "text", maxBucket = 50)
    assert(capped.count() == 0)
    // with the cap above the bucket width the full 60·59/2 pair set returns
    val uncapped = Dedup.nearDupMinhash(df, "doc_id", "text", maxBucket = 5000)
    assert(uncapped.count() == 60L * 59 / 2)
  }

  test("dupClusters: chains collapse to one component, disjoint stay apart") {
    val pairs = Seq(
      (1L, 5L), (5L, 9L),   // chain 1-5-9 → cluster 1
      (20L, 21L))           // separate pair → cluster 20
      .toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 20L -> 20L, 21L -> 20L))
  }

  test("dupClusters: empty pair list yields empty clustering") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.dupClusters(empty).count() == 0)
  }

  test("dupClusters: throws rather than return partial labels when " +
      "maxIters is below what the diameter needs") {
    // One edge PER PARTITION: the union-find contraction pre-pass is
    // the identity (nothing to merge locally), so the loop faces the
    // raw 13-node path. Pointer doubling reaches distance 2^k - 1
    // after k rounds: 3 rounds cover 7 < 12 → cannot converge.
    val chain = spark.sparkContext
      .parallelize((0L until 12L).map(i => (i, i + 1)), numSlices = 12)
      .toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.dupClusters(chain, maxIters = 3)
    }
    assert(e.getMessage.contains("not converged"))
    // with enough iterations the same chain fully collapses to label 0
    val ok = Dedup.dupClusters(chain, maxIters = 15).collect()
    assert(ok.map(_.getLong(1)).forall(_ == 0L))
    // co-located, the same chain contracts partition-locally and
    // converges well under the old diameter bound
    val fast = Dedup.dupClusters(
      (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b").coalesce(1),
      maxIters = 3).collect()
    assert(fast.map(_.getLong(1)).forall(_ == 0L))
  }

  test("dupClusters: pointer doubling collapses a 400-node chain within " +
      "the default iteration budget (plain propagation would need 400)") {
    val chain = (0L until 399L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(chain).collect() // default maxIters = 20
    assert(out.length == 400)
    assert(out.map(_.getLong(1)).forall(_ == 0L))
  }

  test("reliable checkpoint mode materializes through the checkpoint " +
      "dir; invalid modes are rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Dedup.CheckpointModeKey, "reliable")
    try {
      val docs = Seq(
        (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
        (3L, "z y x w v u t s")).toDF("doc_id", "text")
      val pairs = Dedup.nearDupMinhash(docs, "doc_id", "text")
      assert(pairs.count() == 1)
      // reliable mode really wrote through the checkpoint dir
      assert(new java.io.File(dir).listFiles.nonEmpty)
      val clusters = Dedup.dupClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(clusters == Map(1L -> 1L, 2L -> 1L))

      spark.conf.set(Dedup.CheckpointModeKey, "bogus")
      intercept[IllegalArgumentException] {
        Dedup.nearDupMinhash(docs, "doc_id", "text").count()
      }
    } finally spark.conf.unset(Dedup.CheckpointModeKey)
  }

  test("exactSubstrSpans: hand-built corpus — shared run merges into " +
      "one maximal span, uniques report zero") {
    // docs 1 and 2 share the 8-token run "q w e r t y u i" (starts at
    // token 2 in doc 1, token 0 in doc 2); with k=5 that flags starts
    // {2,3,4,5} / {0,1,2,3}, each merging to ONE span of 8 tokens.
    // doc 3 shares nothing. doc 4 repeats a 6-token phrase WITHIN
    // itself → two spans of 6 in the same doc.
    val docs = Seq(
      (1L, "a b q w e r t y u i c d"), // 12 toks, span 8 @2
      (2L, "q w e r t y u i z z2 z3"), // 11 toks, span 8 @0
      (3L, "m n o p s m2 n2 o2 p2 s2"), // 10 toks, none
      (4L, "k l m n o p g1 g2 g3 g4 g5 g6 k l m n o p") // 18 toks, 2×6
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "dup_tokens", "max_span",
        "dup_span_frac")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq
    assert(out == Seq(
      (1L, 1L, 8L, 8L, math.rint(8.0 / 12 * 1e6) / 1e6),
      (2L, 1L, 8L, 8L, math.rint(8.0 / 11 * 1e6) / 1e6),
      (3L, 0L, 0L, 0L, 0.0),
      (4L, 2L, 12L, 6L, math.rint(12.0 / 18 * 1e6) / 1e6)))
  }

  test("removeDupSpans: canonical (min doc, pos) copy survives intact; " +
      "later occurrences are cut, within-doc repeats too") {
    val docs = Seq(
      (1L, "a b q w e r t y u i c d"), // canonical holder: unchanged
      (2L, "q w e r t y u i z z2 z3"), // loses the 8-token run
      (3L, "m n o p s m2 n2 o2 p2 s2"), // untouched
      (4L, "k l m n o p g1 g2 g3 g4 g5 g6 k l m n o p") // 2nd copy cut
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .select("doc_id", "text", "n_spans_removed", "n_tokens_removed")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .toSeq
    assert(out == Seq(
      (1L, "a b q w e r t y u i c d", 0L, 0L),
      (2L, "z z2 z3", 1L, 8L),
      (3L, "m n o p s m2 n2 o2 p2 s2", 0L, 0L),
      (4L, "k l m n o p g1 g2 g3 g4 g5 g6", 1L, 6L)))
  }

  test("removeDupSpans: minSpanTokens — a short common phrase " +
      "survives, a long planted run is cut") {
    val docs = Seq(
      (10L, "u1 P1 P2 P3 P4 P5 u2 L1 L2 L3 L4 L5 L6 L7 L8 L9 L10 " +
        "L11 L12 u3"),
      (11L, "P1 P2 P3 P4 P5 w1 w2 L1 L2 L3 L4 L5 L6 L7 L8 L9 L10 " +
        "L11 L12 w3")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", k = 5,
        minSpanTokens = 10)
      .orderBy("doc_id")
      .select("doc_id", "text", "n_spans_removed", "n_tokens_removed")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .toSeq
    // doc 10 holds every canonical; doc 11's 5-token phrase P1..P5 is
    // below the threshold and stays, its 12-token run L1..L12 is cut
    assert(out == Seq(
      (10L, "u1 p1 p2 p3 p4 p5 u2 l1 l2 l3 l4 l5 l6 l7 l8 l9 l10 " +
        "l11 l12 u3", 0L, 0L),
      (11L, "p1 p2 p3 p4 p5 w1 w2 w3", 1L, 12L)))
  }

  test("removeDupSpans: canonical positions are protected — a merged " +
      "span overlapping a canonical occurrence cannot destroy every " +
      "copy of that content (ADVICE r13)") {
    // doc 1's gram at 5 ("u v w x y") is non-canonical (doc 0 holds
    // it), and its cut span [5,9] overlaps the CANONICAL occurrence of
    // "x y Z1 Z2 Z3" at 8 (doc 2 repeats it). An unprotected cut
    // would remove tokens 8-9 here AND doc 2's whole copy — all
    // copies of "x y Z1 Z2 Z3" gone.
    val docs = Seq(
      (0L, "u v w x y d0a d0b"),
      (1L, "a b c d e u v w x y Z1 Z2 Z3 f g"),
      (2L, "m1 m2 x y Z1 Z2 Z3 m3")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    // doc 1 keeps [8,12] (protected canonical range; the adjacent
    // non-canonical x y surviving is the documented k-gram-resolution
    // under-deletion), doc 2 loses its non-canonical copy
    assert(out == Seq(
      (0L, "u v w x y d0a d0b"),
      (1L, "a b c d e x y z1 z2 z3 f g"),
      (2L, "m1 m2 m3")))
    // the shared content survives somewhere in the corpus
    val texts = out.map(_._2)
    assert(texts.exists(_.contains("x y z1 z2 z3")))
  }

  test("removeDupSpans: idempotent — cleaning the cleaned corpus " +
      "changes nothing") {
    val docs = Seq(
      (1L, "a b q w e r t y u i c d"),
      (2L, "q w e r t y u i z z2 z3"),
      (4L, "k l m n o p g1 g2 g3 g4 g5 g6 k l m n o p"))
      .toDF("doc_id", "text")
    val once = Dedup.removeDupSpans(docs, "doc_id", "text", k = 5)
      .select("doc_id", "text")
    val twice = Dedup.removeDupSpans(once, "doc_id", "text", k = 5)
      .select("doc_id", "text")
    assert(once.orderBy("doc_id").collect().toSeq ==
      twice.orderBy("doc_id").collect().toSeq)
  }

  test("exactSubstrSpans: hashed gram keys (production form) match " +
      "the string-key form exactly") {
    val docs = (0L until 60L).map { i =>
      val body = if (i % 3 == 0) "the quick brown fox jumps over the lazy dog"
        else s"unique u$i v$i w$i x$i y$i z$i a$i b$i"
      (i, s"h$i $body t$i")
    }.toDF("doc_id", "text")
    val a = Dedup.exactSubstrSpans(docs, "doc_id", "text", k = 5,
      hashed = false).orderBy("doc_id").collect().toSeq
    val b = Dedup.exactSubstrSpans(docs, "doc_id", "text", k = 5,
      hashed = true).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("exactSubstrSpans: seeded randomized differential vs a " +
      "plain-Scala brute reference over collision-heavy corpora") {
    val rnd = new scala.util.Random(1313)
    val vocab = Vector("a", "b", "c", "d") // tiny → dense collisions
    for (round <- 0 until 3) {
      val corpus = (0L until 40L).map { id =>
        val n = 6 + rnd.nextInt(18)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val k = 5
      // brute reference: global k-gram counts, per-doc flagged starts,
      // sequential span merge
      val toks = corpus.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val counts = new scala.collection.mutable.HashMap[String, Int]()
      toks.values.foreach { ts =>
        (0 to ts.length - k).foreach { i =>
          val g = ts.slice(i, i + k).mkString(" ")
          counts(g) = counts.getOrElse(g, 0) + 1
        }
      }
      val expect = corpus.map { case (id, _) =>
        val ts = toks(id)
        val flagged = (0 to ts.length - k).filter { i =>
          counts(ts.slice(i, i + k).mkString(" ")) >= 2 }
        var spans = List.empty[(Int, Int)] // (firstStart, lastStart)
        flagged.foreach { p =>
          spans match {
            case (s0, sLast) :: rest if p - sLast <= k =>
              spans = (s0, p) :: rest
            case _ => spans = (p, p) :: spans
          }
        }
        val lens = spans.map { case (s0, sLast) => sLast - s0 + k }
        (id, spans.size.toLong, lens.sum.toLong,
          (0L :: lens.map(_.toLong)).max)
      }.sortBy(_._1)
      val got = Dedup.exactSubstrSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", k = k,
          hashed = round % 2 == 1) // alternate production/string keys
        .orderBy("doc_id")
        .select("doc_id", "n_spans", "dup_tokens", "max_span")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
        .toSeq
      assert(got == expect, s"round $round diverged")
    }
  }

  test("dedup operators leave nothing in the session cache manager") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "z y x w v u t s r q")).toDF("doc_id", "text")
    Dedup.nearDupMinhash(docs, "doc_id", "text").count()
    Dedup.ngramJaccard(docs, "doc_id", "text").count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "persisted frames leaked past the operator call")
  }

  // ---- removeDupLines (CCNet paragraph/line boilerplate dedup) ------

  private val lineDocs = Seq(
    (1L, "cookie banner\nunique article one\nfooter nav"),
    (2L, "cookie banner\nunique article two\nfooter nav"),
    (3L, "unique article three\ncookie banner"),
    (4L, "entirely unique document"))
    .toDF("doc_id", "text")

  private def lineRows(df: org.apache.spark.sql.DataFrame) = df
    .orderBy("doc_id").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    .toSeq

  test("removeDupLines: boilerplate posture cuts EVERY copy of a " +
      "corpus-repeated line, rebuilds in original order, counts " +
      "lines and tokens") {
    val got = lineRows(Dedup.removeDupLines(lineDocs, "doc_id", "text"))
    assert(got == Seq(
      (1L, "unique article one", 2L, 4L),
      (2L, "unique article two", 2L, 4L),
      (3L, "unique article three", 1L, 2L),
      (4L, "entirely unique document", 0L, 0L)))
  }

  test("removeDupLines: keepCanonical keeps the minimal (doc, line) " +
      "occurrence of each repeated line and cuts the rest") {
    val got = lineRows(Dedup.removeDupLines(lineDocs, "doc_id", "text",
      keepCanonical = true))
    // canonical "cookie banner" is (1,0); canonical "footer nav" (1,2)
    assert(got(0) == ((1L, "cookie banner\nunique article one\nfooter nav",
      0L, 0L)))
    assert(got(1) == ((2L, "unique article two", 2L, 4L)))
    assert(got(2) == ((3L, "unique article three", 1L, 2L)))
  }

  test("removeDupLines: hashed keys produce identical output to " +
      "string keys; an all-boilerplate doc rebuilds to empty text") {
    val all = lineDocs.unionByName(
      Seq((5L, "cookie banner\nfooter nav")).toDF("doc_id", "text"))
    val s = lineRows(Dedup.removeDupLines(all, "doc_id", "text"))
    val h = lineRows(Dedup.removeDupLines(all, "doc_id", "text",
      hashed = true))
    assert(s == h)
    assert(s.last == ((5L, "", 2L, 4L)))
  }

  test("removeDupLines: a NULL-text document passes through as empty " +
      "text instead of silently vanishing from the output") {
    val d = Seq((1L, Some("a b\nc d")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = lineRows(Dedup.removeDupLines(d, "doc_id", "text"))
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got(1) == ((2L, "", 0L, 0L)))
  }

  test("removeDupLines: regex-special separators are treated " +
      "literally and minCount raises the boilerplate bar") {
    val d = Seq((1L, "a b|x y|a b"), (2L, "a b|q r"))
      .toDF("doc_id", "text")
    // '|' would split per-character if passed through as a regex;
    // "a b" occurs 3 times corpus-wide (twice within doc 1 — WITHIN-doc
    // repetition counts toward the bar, the CCNet rule)
    val got = lineRows(Dedup.removeDupLines(d, "doc_id", "text",
      sep = "|", minCount = 3))
    assert(got == Seq((1L, "x y", 2L, 4L), (2L, "q r", 1L, 2L)))
    val strict = lineRows(Dedup.removeDupLines(d, "doc_id", "text",
      sep = "|", minCount = 4))
    assert(strict == Seq((1L, "a b|x y|a b", 0L, 0L),
      (2L, "a b|q r", 0L, 0L)))
  }
}
