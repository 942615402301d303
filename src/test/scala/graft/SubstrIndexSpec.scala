package graft

import org.apache.spark.sql.DataFrame

import graft.extra.{Dedup, SubstrIndex}

/** Incremental ExactSubstr dedup: a batch deduped against the persisted
  * gram-posting index must equal the GLOBAL removeDupSpans over
  * corpus ∪ batch restricted to the batch's rows — the equivalence the
  * whole design rests on — plus the LSM lifecycle (append/compact) and
  * the hashed-key production form.
  */
class SubstrIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_substridx_")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def rows(df: DataFrame) = df
    .select("doc_id", "text", "n_spans_removed", "n_tokens_removed")
    .orderBy("doc_id").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    .toSeq

  // corpus: docs 0-2 hold a shared run (canonical in 0) and a corpus-
  // only phrase; batch: 100 repeats the corpus run (corpus-dup), 101 &
  // 102 share a fresh run (batch-mate dup, canonical at 101), 103 is
  // clean
  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight"),
    (1L, "a b the quick brown fox jumps over the lazy dog c"),
    (2L, "corpus only words nothing shared with anything else here"))
    .toDF("doc_id", "text")
  private val batch = Seq(
    (100L, "x1 the quick brown fox jumps over the lazy dog x2"),
    (101L, "m1 m2 fresh shared run alpha beta gamma delta m3"),
    (102L, "n1 fresh shared run alpha beta gamma delta n2 n3"),
    (103L, "totally clean batch document with unique vocabulary only"))
    .toDF("doc_id", "text")

  private def globalRef(minSpan: Int = 0): Seq[(Long, String, Long, Long)] =
    rows(Dedup.removeDupSpans(corpus.unionByName(batch), "doc_id",
        "text", k = 5, minSpanTokens = minSpan)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 100L))

  test("dedupBatch == global removeDupSpans restricted to the batch: " +
      "corpus-dup span cut, batch-mate dup keeps the lower-id copy, " +
      "clean doc untouched") {
    val dir = tmpDir()
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5)
    val inc = rows(SubstrIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text"))
    assert(inc == globalRef())
    val byId = inc.map(t => t._1 -> t).toMap
    assert(byId(100L)._4 > 0L, "corpus-dup span not cut")
    assert(byId(101L)._4 == 0L, "canonical batch-mate was cut")
    assert(byId(102L)._4 > 0L, "batch-mate dup not cut")
    assert(byId(103L) == ((103L,
      "totally clean batch document with unique vocabulary only",
      0L, 0L)))
  }

  test("minSpanTokens flows through: the threshold that spares a span " +
      "in the global operator spares it incrementally too") {
    val dir = tmpDir()
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5)
    val inc = rows(SubstrIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text", minSpanTokens = 9))
    assert(inc == globalRef(minSpan = 9))
  }

  test("LSM lifecycle: append registers an earlier batch's content so " +
      "a later batch dedups against it; compact preserves results and " +
      "folds segments; replayed append (txn) is a no-op") {
    val dir = tmpDir()
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5)
    // ingest batch 1: dedup, then append the CLEANED output
    val cleaned1 = SubstrIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text")
    SubstrIndex.append(cleaned1, "doc_id", "text", dir,
      txn = Some(("s", 0L)))
    val vAfter = graft.extra.IndexManifests.latest(spark, dir).get._1
    // crash replay of the same batchId: bit-identical index
    SubstrIndex.append(cleaned1, "doc_id", "text", dir,
      txn = Some(("s", 0L)))
    assert(graft.extra.IndexManifests.latest(spark, dir).get._1 == vAfter)
    // batch 2 repeats content that SURVIVED batch 1's dedup (101's
    // run survived as canonical-in-batch) → must now be cut as a
    // corpus dup; content CUT from batch 1 (102's copy) is NOT in the
    // index twice, so no phantom anchors
    val batch2 = Seq(
      (200L, "z1 fresh shared run alpha beta gamma delta z2"),
      (201L, "another clean follow up document with new words entirely"))
      .toDF("doc_id", "text")
    val inc2 = rows(SubstrIndex.dedupBatch(spark, dir, batch2,
      "doc_id", "text"))
    // reference: global dedup over corpus ∪ cleaned batch1 ∪ batch2
    val standing = corpus
      .unionByName(cleaned1.select("doc_id", "text"))
    val ref = rows(Dedup.removeDupSpans(standing.unionByName(batch2),
        "doc_id", "text", k = 5)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 200L))
    assert(inc2 == ref)
    assert(inc2.find(_._1 == 200L).get._4 > 0L)
    // compact folds partials; dedup results identical after
    SubstrIndex.compact(spark, dir)
    assert(rows(SubstrIndex.dedupBatch(spark, dir, batch2,
      "doc_id", "text")) == inc2)
  }

  test("restore rolls back a bad batch append through the shared " +
      "manifest layer: dedup verdicts return to the pre-append state") {
    val dir = tmpDir()
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5)      // v1
    val before = rows(SubstrIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text"))
    // a "bad" append: raw batch grams land (violating the cleaned-
    // append contract) — later probes of the same content would be
    // flagged against it
    SubstrIndex.append(batch, "doc_id", "text", dir)             // v2
    val probe = Seq(
      (500L, "q1 fresh shared run alpha beta gamma delta q2"))
      .toDF("doc_id", "text")
    assert(rows(SubstrIndex.dedupBatch(spark, dir, probe,
      "doc_id", "text")).head._4 > 0L) // cut against the appended run
    graft.extra.IndexManifests.restore(spark, dir, 1L)           // v3
    // the rollback head behaves exactly like the pre-append index
    assert(rows(SubstrIndex.dedupBatch(spark, dir, probe,
      "doc_id", "text")).head._4 == 0L)
    assert(rows(SubstrIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text")) == before)
  }

  test("string ids (incl. numeric strings whose lexicographic order " +
      "inverts numeric order) and custom column names: incremental ==" +
      " global under the NATIVE id ordering") {
    // ids "10" < "2" lexicographically: the canonical copy of the
    // shared run must be "10"'s in BOTH arms (a long-cast would null
    // string ids and silently cut nothing)
    val corpusS = Seq(
      ("2", "the quick brown fox jumps over the lazy dog tonight"),
      ("zz", "corpus only words nothing shared with anything else here"))
      .toDF("id", "body")
    val batchS = Seq(
      ("10", "x1 the quick brown fox jumps over the lazy dog x2"),
      ("30", "m1 m2 fresh shared run alpha beta gamma delta m3"),
      ("4",  "n1 fresh shared run alpha beta gamma delta n2 n3"))
      .toDF("id", "body")
    val dir = tmpDir()
    SubstrIndex.build(corpusS, "id", "body", dir, k = 5)
    def strRows(df: DataFrame) = df
      .select("id", "text", "n_spans_removed", "n_tokens_removed")
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val inc = strRows(SubstrIndex.dedupBatch(spark, dir, batchS,
      "id", "body"))
    val ref = strRows(Dedup.removeDupSpans(
        corpusS.unionByName(batchS), "id", "body", k = 5)
      .filter(org.apache.spark.sql.functions.col("id").isin(
        "10", "30", "4")))
    assert(inc == ref)
    val byId = inc.map(t => t._1 -> t).toMap
    // native STRING ordering decides canonicality: "10" < "2", so the
    // BATCH doc "10" holds the corpus run's canonical occurrence and
    // keeps it (both arms agree; this is also why the monotone
    // ingest-id contract matters — the untouchable corpus copy in "2"
    // survives too). Batch-mates: "30" < "4" lexicographically, so
    // "30" keeps the fresh run and "4" loses it.
    assert(byId("10")._4 == 0L)
    assert(byId("30")._4 == 0L)
    assert(byId("4")._4 > 0L)
  }

  test("build rejects a geometry change over a committed index " +
      "(k/hashed mismatch would pair new meta with old segments)") {
    val dir = tmpDir()
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5)
    val e = intercept[IllegalArgumentException] {
      SubstrIndex.build(corpus, "doc_id", "text", dir, k = 7)
    }
    assert(e.getMessage.contains("needs a fresh dir"))
    // same-geometry rebuild stays allowed (meta untouched — no
    // delete-then-write window for a concurrent reader)
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5)
    assert(rows(SubstrIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text")) == globalRef())
  }

  test("a same-geometry rebuild carries the applied-batch ledger " +
      "forward: a stream replay after the corpus refresh still no-ops") {
    val dir = tmpDir()
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5)
    SubstrIndex.append(batch, "doc_id", "text", dir,
      txn = Some(("s", 3L)))
    // corpus refresh over the streamed-into index (rebuild drops the
    // appended segments by design — fresh manifest — but must keep
    // the ledger, like compact does)
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5)
    val v = graft.extra.IndexManifests.latest(spark, dir).get
    assert(v._2(graft.extra.IndexManifests.TxnFrame) == Seq("s:3"))
    // the replayed batch is still a no-op
    SubstrIndex.append(batch, "doc_id", "text", dir,
      txn = Some(("s", 3L)))
    assert(graft.extra.IndexManifests.latest(spark, dir).get._1 == v._1)
  }

  test("seeded randomized differential: incremental dedupBatch == " +
      "global removeDupSpans restricted to the batch, over collision-" +
      "heavy corpora (tiny vocab -> dense gram duplication, canonical/" +
      "protection interplay stressed beyond the fixtures)") {
    val rnd = new scala.util.Random(1414)
    val vocab = Vector("a", "b", "c", "d")
    for (round <- 0 until 3) {
      val mk = (id: Long) => {
        val n = 6 + rnd.nextInt(18)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val corpusR = (0L until 30L).map(mk).toDF("doc_id", "text")
      val batchR = (100L until 115L).map(mk).toDF("doc_id", "text")
      val minSpan = if (round == 2) 8 else 0
      val dir = tmpDir()
      SubstrIndex.build(corpusR, "doc_id", "text", dir, k = 5)
      val inc = rows(SubstrIndex.dedupBatch(spark, dir, batchR,
        "doc_id", "text", minSpanTokens = minSpan))
      val ref = rows(Dedup.removeDupSpans(corpusR.unionByName(batchR),
          "doc_id", "text", k = 5, minSpanTokens = minSpan)
        .filter(org.apache.spark.sql.functions.col("doc_id") >= 100L))
      assert(inc == ref, s"round $round (minSpan=$minSpan):\n" +
        inc.zip(ref).filter(t => t._1 != t._2).take(3).mkString("\n"))
    }
  }

  test("gram-range file pruning (r14 verdict #1): a small batch opens " +
      "a STRICT SUBSET of the posting files — proved physically by " +
      "corrupting a pruned file — with output bit-identical to the " +
      "global operator") {
    // a corpus with wide vocabulary so its grams spread across the 16
    // range-clustered posting files; hashed keys = the production form
    // (uniform key spread — the hardest case for range pruning)
    val rnd = new scala.util.Random(77)
    val vocab = (0 until 400).map(i => s"w$i")
    val corpusW = (0L until 120L).map { id =>
      (id, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    // tiny batch: one doc, ~4 distinct grams — far fewer keys than
    // posting files, so pruning MUST drop files
    val tiny = Seq((900L, corpusW.orderBy("doc_id").head.getString(1)))
      .toDF("doc_id", "text")
    val dir = tmpDir()
    SubstrIndex.build(corpusW, "doc_id", "text", dir, k = 5,
      hashed = true, numFiles = 16)
    val (selected, total) = SubstrIndex.probePostingFiles(spark, dir,
      tiny, "doc_id", "text")
    assert(total >= 16, s"expected >=16 posting files, got $total")
    assert(selected.nonEmpty, "batch repeats corpus content — some " +
      "posting file must match")
    assert(selected.size < total,
      s"no pruning: opened ${selected.size} of $total files")
    // physical proof: clobber every file pruning EXCLUDED — if
    // dedupBatch ever opened one, the parquet read would throw
    val (_, entries, ranges) =
      graft.extra.IndexManifests.latestFull(spark, dir).get
    val selSet = selected.toSet
    val pruned = ranges.keys.map(f => s"$dir/$f").filterNot(selSet)
    assert(pruned.nonEmpty)
    pruned.foreach { f =>
      val p = java.nio.file.Paths.get(new java.net.URI(
        if (f.startsWith("file:")) f else s"file:$f"))
      java.nio.file.Files.write(p, "NOT A PARQUET FILE".getBytes): Unit
    }
    val inc = rows(SubstrIndex.dedupBatch(spark, dir, tiny,
      "doc_id", "text"))
    val ref = rows(Dedup.removeDupSpans(corpusW.unionByName(tiny),
        "doc_id", "text", k = 5)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 900L))
    assert(inc == ref)
    assert(inc.head._4 > 0L, "the repeated doc must lose its span")
  }

  test("appended segments record their own ranges: pruning keeps " +
      "working across build + appends, and a batch with NO index " +
      "overlap opens zero files") {
    val dir = tmpDir()
    // above the small-index probe cutoff (selectRangedFiles
    // skipProbeBelow = 8), so the range probe actually runs
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5,
      numFiles = 12)
    val cleaned = SubstrIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text")
    SubstrIndex.append(cleaned, "doc_id", "text", dir)
    // disjoint-vocabulary probe: every file's gram range misses every
    // batch key, so the selection is EMPTY (dedupBatch then skips the
    // corpus join entirely — batch-mate-only semantics)
    val alien = Seq(
      (700L, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9"),
      (701L, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 yy1 yy2"))
      .toDF("doc_id", "text")
    val (sel, total) = SubstrIndex.probePostingFiles(spark, dir,
      alien, "doc_id", "text")
    assert(total > 0 && sel.isEmpty,
      s"alien batch selected ${sel.size} of $total files")
    // the empty-selection path still dedups batch-mates exactly
    val inc = rows(SubstrIndex.dedupBatch(spark, dir, alien,
      "doc_id", "text"))
    val standing = corpus.unionByName(cleaned.select("doc_id", "text"))
    val ref = rows(Dedup.removeDupSpans(standing.unionByName(alien),
        "doc_id", "text", k = 5)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 700L))
    assert(inc == ref)
    assert(inc.find(_._1 == 701L).get._4 > 0L,
      "the shared zz-run must be cut from the higher id")
  }

  test("auto-compaction at append (r14 verdict #5): a many-batch " +
      "ingest holds the segment count bounded, results stay exact, " +
      "and replay safety survives the auto-compactions") {
    val dir = tmpDir()
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5)
    def segCount() = graft.extra.IndexManifests.latest(spark, dir)
      .get._2("grams").size
    for (b <- 0 until 10) {
      val df = Seq((1000L + b,
        s"batch $b unique words u${b}a u${b}b u${b}c u${b}d u${b}e"))
        .toDF("doc_id", "text")
      SubstrIndex.append(df, "doc_id", "text", dir,
        txn = Some(("auto", b.toLong)), autoCompactFanout = 3)
      // tiered bound: < fanout segments per size tier, ~log tiers
      assert(segCount() <= 7,
        s"segment count ${segCount()} unbounded at batch $b")
    }
    assert(segCount() <= 7)
    // the ledger survived every auto-compaction: the last batch
    // replays into a no-op
    val v = graft.extra.IndexManifests.latest(spark, dir).get._1
    SubstrIndex.append(Seq((1009L, "batch 9 unique words u9a u9b " +
        "u9c u9d u9e")).toDF("doc_id", "text"),
      "doc_id", "text", dir, txn = Some(("auto", 9L)),
      autoCompactFanout = 3)
    assert(graft.extra.IndexManifests.latest(spark, dir).get._1 == v)
    // and the folded index still answers exactly: a probe repeating
    // batch-5 content is cut
    val probe = Seq((2000L,
      "batch 5 unique words u5a u5b u5c u5d u5e"))
      .toDF("doc_id", "text")
    assert(rows(SubstrIndex.dedupBatch(spark, dir, probe,
      "doc_id", "text")).head._4 > 0L)
  }

  test("hashed (production) posting keys give the same dedup as " +
      "string keys") {
    val dirS = tmpDir()
    val dirH = tmpDir()
    SubstrIndex.build(corpus, "doc_id", "text", dirS, k = 5,
      hashed = false)
    SubstrIndex.build(corpus, "doc_id", "text", dirH, k = 5,
      hashed = true)
    assert(rows(SubstrIndex.dedupBatch(spark, dirS, batch,
        "doc_id", "text")) ==
      rows(SubstrIndex.dedupBatch(spark, dirH, batch, "doc_id", "text")))
  }
}
