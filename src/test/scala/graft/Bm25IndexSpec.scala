package graft

import org.apache.spark.sql.functions._

import graft.extra.{Bm25Index, Retrieval}

/** Persisted BM25 index: build → search must be bit-identical to the
  * direct [[Retrieval]] forms, and a search must never touch the
  * documents table — every file it reads lives under the index dir.
  */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bm25idx_")
    d.toFile.deleteOnExit()
    d.toString
  }

  private lazy val docs = graft.model.Tables.load(spark, sfDir, "documents")
  private lazy val dir: String = {
    val d = tmpDir()
    Bm25Index.build(docs, "doc_id", "text", d)
    d
  }

  test("single-query search over the index ≡ Retrieval.bm25Search " +
      "bit-for-bit") {
    val terms = Seq("spark", "shuffle", "join")
    val direct = Retrieval.bm25Search(docs, "doc_id", "text", terms,
        topK = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val indexed = Bm25Index.search(spark, dir, terms, idCol = "doc_id",
        topK = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(indexed.nonEmpty && indexed == direct)
  }

  test("multi-query search over the index ≡ Retrieval.bm25SearchAll " +
      "bit-for-bit") {
    val queries = Seq(("q1", "spark shuffle join"), ("q2", "window sort"),
      ("q3", "hash table")).toDF("query_id", "query_text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_hits"), r.getAs[Double]("score"))
    val direct = Retrieval.bm25SearchAll(docs, "doc_id", "text",
        queries, "query_id", "query_text", topK = 5)
      .collect().map(key).sortBy(t => (t._1, -t._4, t._2)).toSeq
    val indexed = Bm25Index.searchAll(spark, dir, queries,
        "query_id", "query_text", idCol = "doc_id", topK = 5)
      .collect().map(key).sortBy(t => (t._1, -t._4, t._2)).toSeq
    assert(indexed.nonEmpty && indexed == direct)
  }

  test("a search reads only the index layout — never the documents " +
      "table") {
    val queries = Seq(("q1", "spark shuffle join"))
      .toDF("query_id", "query_text")
    val out = Bm25Index.searchAll(spark, dir, queries,
      "query_id", "query_text", idCol = "doc_id", topK = 5)
    val files = out.inputFiles
    assert(files.nonEmpty)
    val canon = new java.io.File(dir).getCanonicalPath
    assert(files.forall(f =>
      new java.io.File(new java.net.URI(f).getPath)
        .getCanonicalPath.startsWith(canon)),
      s"search read outside the index dir:\n${files.mkString("\n")}")
  }

  test("the query-term predicate is PUSHED into the index scans " +
      "(static IN → file-prunable), both search forms") {
    // a broadcast equijoin restricts rows but pushes nothing into the
    // scan; the collected-terms static filter is what turns the
    // range-clustered tf layout into skippable posting files at scale
    val single = Bm25Index.search(spark, dir, Seq("spark", "shuffle"),
      idCol = "doc_id").queryExecution.executedPlan.toString
    assert(single.contains("In(term"),
      s"tf scan lost the term pushdown:\n${single.take(1500)}")
    val queries = Seq(("q1", "spark shuffle join"))
      .toDF("query_id", "query_text")
    val multi = Bm25Index.searchAll(spark, dir, queries,
      "query_id", "query_text", idCol = "doc_id")
      .queryExecution.executedPlan.toString
    assert(multi.contains("In(term"),
      s"multi-query tf scan lost the term pushdown:\n${multi.take(1500)}")
  }

  test("append: build(a) + append(b) ≡ build(a ∪ b) bit-for-bit — " +
      "log-structured df/meta partials aggregate at read") {
    val half = docs.filter(col("doc_id") < 250)
    val rest = docs.filter(col("doc_id") >= 250)
    val dInc = tmpDir(); val dFull = tmpDir()
    Bm25Index.build(half, "doc_id", "text", dInc)
    Bm25Index.append(rest, "doc_id", "text", dInc)
    Bm25Index.build(docs, "doc_id", "text", dFull)
    def rows(d: String, ratio: Double) =
      Bm25Index.search(spark, d, Seq("spark", "shuffle", "join"),
        idCol = "doc_id", topK = 20, maxDfRatio = ratio).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(dInc, 1.0).nonEmpty && rows(dInc, 1.0) == rows(dFull, 1.0))
    // the stop-cut threshold must see MERGED df counts, not partials
    assert(rows(dInc, 0.5) == rows(dFull, 0.5))
    val queries = Seq(("q1", "spark shuffle join"), ("q2", "window sort"))
      .toDF("query_id", "query_text")
    def all(d: String) = Bm25Index.searchAll(spark, d, queries,
        "query_id", "query_text", idCol = "doc_id", topK = 5)
      .collect().map(r => (r.getAs[String]("query_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"),
        r.getAs[Double]("score")))
      .sortBy(t => (t._1, -t._4, t._2)).toSeq
    assert(all(dInc) == all(dFull))
  }

  test("compact after appends: searches bit-identical, df/meta " +
      "partials merged to final counts") {
    val dInc = tmpDir()
    Bm25Index.build(docs.filter(col("doc_id") < 200), "doc_id", "text",
      dInc)
    Bm25Index.append(docs.filter(col("doc_id") >= 200 &&
      col("doc_id") < 400), "doc_id", "text", dInc)
    Bm25Index.append(docs.filter(col("doc_id") >= 400), "doc_id", "text",
      dInc)
    def hits() = Bm25Index.search(spark, dInc,
        Seq("spark", "shuffle", "join"), idCol = "doc_id", topK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val before = hits()
    assert(spark.read.parquet(s"$dInc/meta/*").count() == 3L)
    Bm25Index.compact(spark, dInc)
    assert(hits() == before)
    assert(spark.read.parquet(s"$dInc/meta/*").count() == 1L)
    // df holds one final count per term after the merge
    assert(spark.read.parquet(s"$dInc/df/*")
      .groupBy("term").count().filter(col("count") > 1).count() == 0L)
  }

  test("IndexedCorpus: build-if-absent is CONTENT-keyed — same content " +
      "reuses the index dir, any content change forces a new build") {
    val a = Seq((0L, "spark shuffle"), (1L, "hash join"))
      .toDF("doc_id", "text")
    val d1 = graft.queries.IndexedCorpus.bm25Dir(a, "doc_id", "text")
    // completion marker is IndexedCorpus's cachedDir commit (the
    // segmented BM25 layout commits internally via its manifest)
    val meta = new java.io.File(d1, "_GRAFT_COMPLETE")
    assert(meta.exists())
    val built = meta.lastModified()
    // identical content (different frame instance) → same dir, no rebuild
    val a2 = Seq((1L, "hash join"), (0L, "spark shuffle"))
      .toDF("doc_id", "text")
    assert(graft.queries.IndexedCorpus.bm25Dir(a2, "doc_id", "text") == d1)
    assert(meta.lastModified() == built, "identical corpus must not rebuild")
    // one edited row → different fingerprint → different dir
    val b = Seq((0L, "spark shuffle"), (1L, "hash JOIN edited"))
      .toDF("doc_id", "text")
    assert(graft.queries.IndexedCorpus.bm25Dir(b, "doc_id", "text") != d1)
  }

  test("maxDfRatio stop-term cut ≡ searching the query with its " +
      "high-df terms removed (both forms); all-stop query → empty") {
    val d2 = tmpDir()
    // 'the' in every doc (df = 1.0); content terms rare
    val corpus = Seq(
      (0L, "the spark shuffle"), (1L, "the spark join"),
      (2L, "the window sort"), (3L, "the hash table"),
      (4L, "the sort merge"), (5L, "the broadcast loop"))
      .toDF("doc_id", "text")
    Bm25Index.build(corpus, "doc_id", "text", d2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    val pruned = rows(Bm25Index.search(spark, d2,
      Seq("the", "spark", "sort"), idCol = "doc_id", maxDfRatio = 0.5))
    val stripped = rows(Bm25Index.search(spark, d2,
      Seq("spark", "sort"), idCol = "doc_id"))
    assert(pruned.nonEmpty && pruned == stripped)
    val queries = Seq(("q1", "the spark sort")).toDF("query_id", "qtext")
    val prunedAll = Bm25Index.searchAll(spark, d2, queries, "query_id",
        "qtext", idCol = "doc_id", maxDfRatio = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_hits"), r.getAs[Double]("score")))
      .sortBy(t => (-t._3, t._1)).toSeq
    assert(prunedAll == pruned.sortBy(t => (-t._3, t._1)))
    assert(Bm25Index.search(spark, d2, Seq("the"), idCol = "doc_id",
      maxDfRatio = 0.5).isEmpty)
    assert(Bm25Index.searchAll(spark, d2,
      Seq(("q1", "the")).toDF("query_id", "qtext"), "query_id", "qtext",
      idCol = "doc_id", maxDfRatio = 0.5).isEmpty)
  }

  test("empty-token corpus rows are countable: n_docs includes docs " +
      "with no tokens (bm25Search parity)") {
    val d2 = tmpDir()
    val mixed = Seq((0L, "spark shuffle"), (1L, ""), (2L, "spark"))
      .toDF("doc_id", "text")
    Bm25Index.build(mixed, "doc_id", "text", d2)
    val meta = spark.read.parquet(s"$d2/meta/*").head()
    assert(meta.getAs[Long]("n_docs") == 3L)
    // idf therefore matches the direct form on the same tiny corpus
    val direct = Retrieval.bm25Search(mixed, "doc_id", "text",
        Seq("spark")).collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val indexed = Bm25Index.search(spark, d2, Seq("spark"),
        idCol = "doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(indexed == direct)
  }

  test("delete: tombstoned docs vanish from results immediately, meta " +
      "stays exact, re-delete is a no-op, and compact restores full " +
      "fresh-build bit-parity") {
    val d3 = tmpDir()
    Bm25Index.build(docs, "doc_id", "text", d3)
    val terms = Seq("spark", "shuffle", "join")
    val before = Bm25Index.search(spark, d3, terms, idCol = "doc_id",
      topK = 10).collect()
    val victims = before.take(2).map(_.getLong(0)).toSeq
    assert(Bm25Index.delete(spark, d3, victims.toDF("doc_id"),
      "doc_id") == 2L)

    // membership: gone at once, top-k refilled from survivors
    val after = Bm25Index.search(spark, d3, terms, idCol = "doc_id",
      topK = 10).collect()
    assert(after.length == 10)
    assert(!after.map(_.getLong(0)).toSet.exists(victims.contains))

    // n_docs/sum_dl track the live corpus exactly — the correction is
    // CARRIED BY the tombstone rows (one atomic append; the meta dir
    // itself is untouched, so there is no second write for a crashed
    // retry to repeat — the old negative-partial design's window)
    val live = docs.filter(!col("doc_id").isin(victims: _*))
    val metaRaw = spark.read.parquet(s"$d3/meta/*")
      .agg(sum("n_docs").as("n"), sum("sum_dl").as("s")).head()
    assert(metaRaw.getAs[Long]("n") == docs.count()) // meta untouched
    val tombNet = spark.read.parquet(s"$d3/tombstones/*")
      .agg(sum("n").as("n"), sum("s").as("s")).head()
    assert(metaRaw.getAs[Long]("n") - tombNet.getAs[Long]("n")
      == live.count())

    // idempotence: re-deleting tombstones nothing new
    assert(Bm25Index.delete(spark, d3, victims.toDF("doc_id"),
      "doc_id") == 0L)
    val tombNet2 = spark.read.parquet(s"$d3/tombstones/*")
      .agg(sum("n").as("n")).head()
    assert(tombNet2.getAs[Long]("n") == tombNet.getAs[Long]("n"))

    // compact makes it physical: bit-parity with a fresh build over
    // the surviving corpus (df correction included), tombstones gone
    Bm25Index.compact(spark, d3)
    val dFresh = tmpDir()
    Bm25Index.build(live, "doc_id", "text", dFresh)
    def rows(d: String) = Bm25Index.search(spark, d, terms,
        idCol = "doc_id", topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(d3) == rows(dFresh))
    assert(!new java.io.File(s"$d3/tombstones").exists())
  }

  test("delete -> restore round-trips through the shared manifest " +
      "layer: the rollback head serves pre-delete results (one commit " +
      "protocol across the index family — r13 verdict #4)") {
    val d = tmpDir()
    Bm25Index.build(docs, "doc_id", "text", d)
    val terms = Seq("spark", "shuffle", "join")
    def rows() = Bm25Index.search(spark, d, terms, idCol = "doc_id",
        topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val orig = rows()
    val victims = orig.take(2).map(_._1)
    Bm25Index.delete(spark, d, victims.toDF("doc_id"), "doc_id") // v2
    val deleted = rows()
    assert(!deleted.map(_._1).toSet.exists(victims.contains))
    graft.extra.IndexManifests.restore(spark, d, 1L)             // v3
    assert(rows() == orig)
    // rollback of the rollback re-applies the delete
    graft.extra.IndexManifests.restore(spark, d, 2L)             // v4
    assert(rows() == deleted)
  }

  test("snapshot isolation: uncommitted segment files are invisible " +
      "to searches — a torn in-flight append can never be read; the " +
      "manifest commit makes it visible atomically") {
    val d = tmpDir()
    Bm25Index.build(docs.filter(col("doc_id") < 300), "doc_id", "text", d)
    val terms = Seq("spark", "shuffle", "join")
    def rows() = Bm25Index.search(spark, d, terms, idCol = "doc_id",
        topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val committed = rows()

    // simulate the torn middle of a concurrent append: new tf/dl/df
    // segment files exist on disk (what a crashed or in-flight writer
    // leaves) but NO manifest commit — exactly the state the old
    // directory-scan reader consumed as a half-applied append
    val extra = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val tfTorn = extra.select(col("doc_id").as("id"),
        explode(graft.extra.Text.tokens(col("text"))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    tfTorn.write.parquet(s"$d/tf/seg-torn")
    tfTorn.groupBy("id").agg(sum("tf").as("dl"))
      .write.parquet(s"$d/dl/seg-torn")
    tfTorn.groupBy("term").agg(count(lit(1)).as("df"))
      .write.parquet(s"$d/df/seg-torn")
    // note: deliberately NO meta partial — the classic torn state

    assert(rows() == committed,
      "uncommitted segments must be invisible to a search")

    // a real append COMMITS, and only then do the new docs surface
    Bm25Index.append(extra, "doc_id", "text", d)
    val after = rows()
    assert(after != committed)
    // and the result equals a fresh build over the union (the torn
    // leftovers stay dead weight until a compact sweeps them)
    val dRef = tmpDir()
    Bm25Index.build(docs.filter(col("doc_id") < 400), "doc_id", "text",
      dRef)
    def rowsAt(dd: String) = Bm25Index.search(spark, dd, terms,
        idCol = "doc_id", topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(after == rowsAt(dRef))
    // compact drops the orphaned torn segment physically
    Bm25Index.compact(spark, d)
    assert(!new java.io.File(s"$d/tf/seg-torn").exists())
    assert(rowsAt(d) == after)
  }

  test("append to a manifest-less dir WITH segment data fails loudly " +
      "instead of silently re-basing the index on only the new batch; " +
      "append to an EMPTY dir bootstraps a fresh index") {
    val d = tmpDir()
    // a pre-manifest layout: segment files on disk, no _manifests —
    // append must NOT commit a manifest naming only its own segments
    // (the old corpus would vanish from every search)
    docs.filter(col("doc_id") < 100)
      .select(col("doc_id").as("id"), lit("x").as("term"),
        lit(1L).as("tf"))
      .write.parquet(s"$d/tf/seg-000000001")
    val err = intercept[IllegalStateException] {
      Bm25Index.append(docs.filter(col("doc_id") >= 100 &&
        col("doc_id") < 120), "doc_id", "text", d)
    }
    assert(err.getMessage.contains("no committed BM25 index"))
    // a plain-uninitialized dir is DIFFERENT: nothing exists to
    // vanish, so appending there bootstraps a fresh index — the
    // streaming-ingest first micro-batch (AnnIngest.startBm25 appends
    // from batch 0 with no prior build)
    val fresh = tmpDir()
    Bm25Index.append(docs.filter(col("doc_id") < 20), "doc_id", "text",
      fresh)
    assert(Bm25Index.search(spark, fresh, Seq("the"),
      idCol = "doc_id", topK = 5).count() >= 0)
    // and the bootstrap committed a manifest (not a legacy layout)
    assert(new java.io.File(s"$fresh/_manifests").exists())
  }

  test("manifest-range file pruning (r15): a search opens only tf/df " +
      "files whose recorded term range can hold a query term — proved " +
      "physically by corrupting every other file") {
    val rnd = new scala.util.Random(55)
    val vocab = (0 until 600).map(i => f"w$i%03d")
    val wide = (0L until 300L).map { id =>
      (id, Seq.fill(15)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val d = tmpDir()
    Bm25Index.build(wide, "doc_id", "text", d, numFiles = 16)
    val term = "w010"
    val before = Bm25Index.search(spark, d, Seq(term),
      idCol = "doc_id", topK = 10).collect().map(_.toString).toSeq
    assert(before.nonEmpty)
    val (_, _, ranges) =
      graft.extra.IndexManifests.latestFull(spark, d).get
    val termFiles = ranges.filter { case (f, _) =>
      f.startsWith("tf/") || f.startsWith("df/") }
    assert(termFiles.nonEmpty, "tf/df files must carry #range= stats")
    val pruned = termFiles.collect {
      case (f, (mn, mx)) if term < mn || term > mx => f
    }.toSeq
    assert(pruned.nonEmpty && pruned.size < termFiles.size,
      s"expected a strict subset: ${pruned.size} of ${termFiles.size}")
    pruned.foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/$f"),
        "NOT A PARQUET FILE".getBytes): Unit
    }
    // if the search opened any corrupted file the parquet read throws;
    // identical hits prove pruning changed I/O, never results
    assert(Bm25Index.search(spark, d, Seq(term), idCol = "doc_id",
      topK = 10).collect().map(_.toString).toSeq == before)
    // multi-query arm plans with the same pruning
    val q = Seq((0L, term)).toDF("qid", "qtext")
    assert(Bm25Index.searchAll(spark, d, q, "qid", "qtext",
      idCol = "doc_id", topK = 10).count() == before.size)
  }

  test("auto-compaction at append (r14 verdict #5): a many-batch " +
      "ingest holds the tf segment count bounded, searches stay " +
      "bit-identical, and replay safety survives the folds") {
    val d = tmpDir()
    def segCount() = graft.extra.IndexManifests.latest(spark, d)
      .get._2.getOrElse("tf", Nil).size
    for (b <- 0 until 10) {
      Bm25Index.append(
        Seq((1000L + b, s"alpha batch$b unique u${b}x u${b}y"))
          .toDF("doc_id", "text"),
        "doc_id", "text", d, txn = Some(("auto", b.toLong)),
        autoCompactFanout = 3)
      // tiered bound: < fanout segments per size tier, ~log tiers
      assert(segCount() <= 7,
        s"tf segments ${segCount()} unbounded at batch $b")
    }
    // the folded index equals a fresh build over the same rows
    val all = (0 until 10).map(b =>
      (1000L + b, s"alpha batch$b unique u${b}x u${b}y"))
      .toDF("doc_id", "text")
    val fresh = tmpDir()
    Bm25Index.build(all, "doc_id", "text", fresh)
    def hits(dd: String) = Bm25Index.search(spark, dd,
      Seq("alpha", "batch5"), idCol = "doc_id", topK = 10)
      .collect().map(_.toString).toSeq
    assert(hits(d) == hits(fresh))
    // ledger survived the auto-compactions: the last batch replays
    // into a no-op
    val v = graft.extra.IndexManifests.latest(spark, d).get._1
    Bm25Index.append(
      Seq((1009L, "alpha batch9 unique u9x u9y")).toDF("doc_id", "text"),
      "doc_id", "text", d, txn = Some(("auto", 9L)),
      autoCompactFanout = 3)
    assert(graft.extra.IndexManifests.latest(spark, d).get._1 == v)
  }

  test("the manifest commit is a true CAS: a version collision throws " +
      "and never clobbers the committed manifest (RawLocalFileSystem " +
      "rename would have replaced it)") {
    val d = tmpDir()
    val winner = Map("tf" -> Seq("tf/seg-000000001"))
    graft.extra.IndexManifests.commit(spark, d, 1L, winner)
    // a racing loser computing the same version must throw, and the
    // winner's committed bytes must survive the attempt (rename-based
    // commits clobbered here on RawLocalFileSystem)
    intercept[java.util.ConcurrentModificationException] {
      graft.extra.IndexManifests.commit(spark, d, 1L,
        Map("tf" -> Seq("tf/seg-loser")))
    }
    assert(graft.extra.IndexManifests.latest(spark, d)
      .contains((1L, winner)))
  }
}
