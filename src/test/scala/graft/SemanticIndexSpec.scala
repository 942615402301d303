package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.extra.{SemanticIndex, Similarity}

/** Persisted semantic-dedup index ([[graft.extra.SemanticIndex]]):
  * verdicts must equal the SemDeDup keep-min-id rule over
  * (indexed ∪ batch) under the index's FROZEN codebook restricted to
  * batch rows — checked on a planted fixture AND by a seeded
  * randomized differential against an independent reference
  * formulation — plus the LSM lifecycle, the frozen-codebook rebuild
  * contract, physical partition pruning, and the semantic
  * decontamination operator sharing the vector machinery.
  */
class SemanticIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String = {
    val d = java.nio.file.Files.createTempDirectory(p)
    d.toFile.deleteOnExit()
    d.toString
  }

  // corpus: three orthogonal unit vectors — with numClusters ≥ |corpus|
  // every corpus vector is its own centroid (cid = vec id)
  private val corpus = Seq(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(0f, 1f, 0f, 0f)),
    (2L, Seq(0f, 0f, 1f, 0f)))
    .toDF("doc_id", "embedding")
  // batch: 100 near-copies corpus 0; 101/102 are batch-mates near the
  // corpus-2 axis but BELOW threshold vs corpus 2 itself (101 keeps,
  // 102 dups onto 101); 103 is clean
  private val batch = Seq(
    (100L, Seq(0.98f, 0.02f, 0f, 0f)),
    (101L, Seq(0f, 0f, 0.6f, 0.8f)),
    (102L, Seq(0f, 0f, 0.62f, 0.79f)),
    (103L, Seq(0.1f, 0.1f, 0.1f, 0.97f)))
    .toDF("doc_id", "embedding")

  private def verdicts(df: DataFrame) = df
    .select("doc_id", "is_dup", "dup_of")
    .orderBy("doc_id").collect()
    .map(r => (r.getLong(0), r.getBoolean(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq

  test("planted fixture: corpus-dup anchors to the indexed id, " +
      "batch-mate dup to the smaller mate, keepers unflagged") {
    val dir = tmp("graft_semidx_")
    SemanticIndex.build(corpus, "doc_id", "embedding", dir)
    val v = verdicts(SemanticIndex.dedupBatch(spark, dir, batch,
      "doc_id", "embedding", threshold = 0.95))
    assert(v == Seq(
      (100L, true, 0L), (101L, false, -1L),
      (102L, true, 101L), (103L, false, -1L)))
  }

  /** Independent reference: assign corpus ∪ batch under the index's
    * codebook, flag each batch row with ANY same-cluster lower-id
    * partner at rounded cosine ≥ τ, dup_of = min partner.
    */
  private def reference(dir: String, all: DataFrame, batchIds: Set[Long],
      thr: Double): Seq[(Long, Boolean, Long)] = {
    val cents = SemanticIndex.readCodebook(spark, dir)
    val asg = Similarity.assignClusters(all, "doc_id", "embedding", cents)
    val lo = asg.select(col("cluster_id"), col("id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val pairs = asg.select(col("cluster_id"), col("id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb"))
      .join(lo, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(Similarity.dot(col("va"), col("vb")) /
        (sqrt(col("na")) * sqrt(col("nb"))), 6) >= thr)
      .groupBy(col("id_b")).agg(min(col("id_a")).as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    all.select("doc_id").collect().map(_.getLong(0))
      .filter(batchIds.contains).sorted.toSeq
      .map(id => (id, pairs.contains(id), pairs.getOrElse(id, -1L)))
  }

  test("seeded randomized differential: index verdicts ≡ the global " +
      "keep-min-id rule under the frozen codebook, restricted to " +
      "batch rows") {
    val rnd = new scala.util.Random(42)
    def vec() = Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)
    // clustered-ish corpus: half the vectors are jittered copies of a
    // few anchors so real near-dups exist at the 0.9 bar
    val anchors = Seq.fill(5)(vec())
    def jitter(a: Seq[Float]) =
      a.map(x => x + (rnd.nextDouble() * 0.06 - 0.03).toFloat)
    val corpusR = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, jitter(anchors((i / 2 % 5).toInt))) else (i, vec())
    }.toDF("doc_id", "embedding")
    val batchR = (100L until 125L).map { i =>
      if (i % 3 == 0) (i, jitter(anchors((i % 5).toInt))) else (i, vec())
    }.toDF("doc_id", "embedding")
    val dir = tmp("graft_semidx_rnd_")
    SemanticIndex.build(corpusR, "doc_id", "embedding", dir,
      numClusters = 8)
    val got = verdicts(SemanticIndex.dedupBatch(spark, dir, batchR,
      "doc_id", "embedding", threshold = 0.9))
    val want = reference(dir, corpusR.unionByName(batchR),
      (100L until 125L).toSet, 0.9)
    assert(got == want)
    assert(got.exists(_._2) && got.exists(!_._2),
      "fixture must exercise both dup and keeper paths")
  }

  test("LSM lifecycle: append survivors, later batch anchors to a " +
      "SURVIVOR but not to a dropped dup; compact preserves verdicts " +
      "and folds to one segment; txn replay is a no-op") {
    val dir = tmp("graft_semidx_lsm_")
    SemanticIndex.build(corpus, "doc_id", "embedding", dir)
    val v1 = SemanticIndex.dedupBatch(spark, dir, batch,
      "doc_id", "embedding", threshold = 0.95)
    val keep = batch.join(v1.filter(!col("is_dup")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    assert(SemanticIndex.append(keep, "doc_id", "embedding", dir,
      txn = Some(("s1", 0L))))
    // replay: ledger skips, version unchanged
    val ver = graft.extra.IndexManifests.latest(spark, dir).get._1
    assert(!SemanticIndex.append(keep, "doc_id", "embedding", dir,
      txn = Some(("s1", 0L))))
    assert(graft.extra.IndexManifests.latest(spark, dir).get._1 == ver)
    // 200 near-copies survivor 101 → flagged onto 101; 201 near-copies
    // the DROPPED 102's direction only as far as 101 anchors it too —
    // use a copy of dropped 100's axis instead: it anchors to corpus 0
    // (the axis survivor), never to the dropped 100
    val b2 = Seq(
      (200L, Seq(0f, 0f, 0.61f, 0.795f)),
      (201L, Seq(0.985f, 0.015f, 0f, 0f)))
      .toDF("doc_id", "embedding")
    val v2 = verdicts(SemanticIndex.dedupBatch(spark, dir, b2,
      "doc_id", "embedding", threshold = 0.95))
    assert(v2 == Seq((200L, true, 101L), (201L, true, 0L)))
    // compact: bit-identical verdicts, one live segment
    SemanticIndex.compact(spark, dir)
    val v2c = verdicts(SemanticIndex.dedupBatch(spark, dir, b2,
      "doc_id", "embedding", threshold = 0.95))
    assert(v2c == v2)
    val (_, entries) = graft.extra.IndexManifests.latest(spark, dir).get
    assert(entries("vectors").size == 1)
  }

  test("an all-duplicates batch appends NOTHING (no file-less poison " +
      "segment, no version bump) and the NEXT batch still serves") {
    val dir = tmp("graft_semidx_empty_")
    SemanticIndex.build(corpus, "doc_id", "embedding", dir)
    val v0 = graft.extra.IndexManifests.latest(spark, dir).get._1
    // every batch doc near-copies corpus 0 → zero survivors
    val allDup = Seq((100L, Seq(0.99f, 0.01f, 0f, 0f)))
      .toDF("doc_id", "embedding")
    val keep = allDup.join(
      SemanticIndex.dedupBatch(spark, dir, allDup, "doc_id",
        "embedding", threshold = 0.95)
        .filter(!col("is_dup")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    assert(!SemanticIndex.append(keep, "doc_id", "embedding", dir,
      txn = Some(("sE", 0L))))
    assert(graft.extra.IndexManifests.latest(spark, dir).get._1 == v0)
    val next = verdicts(SemanticIndex.dedupBatch(spark, dir,
      Seq((200L, Seq(0f, 0.98f, 0.02f, 0f))).toDF("doc_id", "embedding"),
      "doc_id", "embedding", threshold = 0.95))
    assert(next == Seq((200L, true, 1L)))
  }

  test("rebuild keeps the frozen codebook (appends and rebuilds never " +
      "retrain)") {
    val dir = tmp("graft_semidx_frozen_")
    SemanticIndex.build(corpus, "doc_id", "embedding", dir)
    val cb1 = SemanticIndex.readCodebook(spark, dir)
    SemanticIndex.build(corpus.unionByName(batch), "doc_id", "embedding",
      dir, numClusters = 2)
    val cb2 = SemanticIndex.readCodebook(spark, dir)
    assert(cb1.map(_.cid) == cb2.map(_.cid))
  }

  test("physical partition pruning: a batch touching one cluster " +
      "never opens the other clusters' files (corrupted on disk, " +
      "verdicts unchanged)") {
    val dir = tmp("graft_semidx_prune_")
    SemanticIndex.build(corpus, "doc_id", "embedding", dir)
    val one = Seq((100L, Seq(0.98f, 0.02f, 0f, 0f)))
      .toDF("doc_id", "embedding")
    val before = verdicts(SemanticIndex.dedupBatch(spark, dir, one,
      "doc_id", "embedding", threshold = 0.95))
    assert(before == Seq((100L, true, 0L)))
    // corrupt every parquet under the UNTOUCHED clusters' partitions
    val root = new java.io.File(dir)
    val corrupted = new java.io.File(root, "vectors")
      .listFiles().flatMap(_.listFiles())
      .filter(f => f.getName.startsWith("list_id=") &&
        f.getName != "list_id=0")
      .flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(corrupted.nonEmpty)
    corrupted.foreach { f =>
      val w = new java.io.FileOutputStream(f)
      try w.write("not parquet".getBytes) finally w.close()
    }
    val after = verdicts(SemanticIndex.dedupBatch(spark, dir, one,
      "doc_id", "embedding", threshold = 0.95))
    assert(after == before)
  }

  test("over-budget batch auto-splits into chunked broadcast probes " +
      "(r15 verdict #4) with verdicts bit-identical to the one-chunk " +
      "path — batch-mate pairs covered across chunk boundaries") {
    val dir = tmp("sem_chunk_idx")
    SemanticIndex.build(corpus, "doc_id", "embedding", dir,
      numClusters = 8)
    val one = verdicts(SemanticIndex.dedupBatch(spark, dir, batch,
      "doc_id", "embedding", 0.95))
    // a ~1-byte budget forces one chunk per row (4 rows → 4 chunks);
    // 101/102 are batch-mates that hash into different chunks, so
    // this exercises the cross-chunk mate coverage
    val chunked = verdicts(SemanticIndex.dedupBatch(spark, dir, batch,
      "doc_id", "embedding", 0.95, broadcastBudgetBytes = 1L))
    assert(chunked == one)
    assert(chunked.exists { case (id, dup, of) =>
      id == 102L && dup && of == 101L })
  }

  test("LSM takedown (r15 verdict #4): delete tombstones a corpus " +
      "doc — verdicts immediately equal an index built without it — " +
      "and compact makes the purge physical") {
    val dir = tmp("sem_del_idx")
    SemanticIndex.build(corpus, "doc_id", "embedding", dir,
      numClusters = 8)
    // doc 100 near-copies corpus 0; deleting corpus 0 must stop it
    // anchoring — under the SAME frozen codebook (survivor-built twin
    // indexes train different codebooks, so compare against the same
    // dir pre/post delete instead)
    val before = verdicts(SemanticIndex.dedupBatch(spark, dir, batch,
      "doc_id", "embedding", 0.95))
    assert(before.exists { case (id, dup, of) =>
      id == 100L && dup && of == 0L })
    assert(SemanticIndex.delete(spark, dir,
      Seq(Tuple1(0L)).toDF("d")) == 1L)
    val after = verdicts(SemanticIndex.dedupBatch(spark, dir, batch,
      "doc_id", "embedding", 0.95))
    assert(after.exists { case (id, dup, _) => id == 100L && !dup },
      s"deleted doc 0 still anchors: $after")
    // everything else unchanged
    assert(after.filter(_._1 != 100L) == before.filter(_._1 != 100L))
    // idempotent re-delete
    assert(SemanticIndex.delete(spark, dir,
      Seq(Tuple1(0L)).toDF("d")) == 0L)
    // compact: purge physical (row gone from the vector scan), the
    // tombstone frame dropped, verdicts unchanged
    SemanticIndex.compact(spark, dir)
    val (_, entries) =
      graft.extra.IndexManifests.latest(spark, dir).get
    assert(!entries.contains("tombstones"))
    assert(verdicts(SemanticIndex.dedupBatch(spark, dir, batch,
      "doc_id", "embedding", 0.95)) == after)
  }

  test("compact after a FULL takedown commits an empty index instead " +
      "of a file-less poison segment; batch-mate verdicts still work " +
      "and a later append re-seeds (review r16)") {
    val dir = tmp("sem_full_del")
    SemanticIndex.build(corpus, "doc_id", "embedding", dir,
      numClusters = 8)
    assert(SemanticIndex.delete(spark, dir,
      Seq(0L, 1L, 2L).toDF("d")) == 3L)
    SemanticIndex.compact(spark, dir)
    val (_, entries) = graft.extra.IndexManifests.latest(spark, dir).get
    assert(!entries.contains("vectors") && !entries.contains("tombstones"))
    // an empty index: no corpus anchors, batch-mate rule still applies
    val v = verdicts(SemanticIndex.dedupBatch(spark, dir, batch,
      "doc_id", "embedding", 0.95))
    assert(v.count(_._2) == 1 &&
      v.exists { case (id, dup, of) => id == 102L && dup && of == 101L })
    // append re-seeds segments under the SURVIVING frozen codebook
    assert(SemanticIndex.append(corpus, "doc_id", "embedding", dir))
    assert(verdicts(SemanticIndex.dedupBatch(spark, dir, batch,
      "doc_id", "embedding", 0.95)).exists {
        case (id, dup, of) => id == 100L && dup && of == 0L })
  }

  // ---- decontaminateSemantic (shares the vector machinery) ---------

  test("decontaminateSemantic: paraphrase-leak flagged at its cosine, " +
      "clean docs carry their max; empty / zero-only benchmarks flag " +
      "nothing; mixed dims reject") {
    import graft.extra.Text
    val corpusE = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 0.6f, 0.8f, 0f)),
      (2L, Seq(0f, 0f, 0f, 1f)))
      .toDF("doc_id", "embedding")
    val bench = Seq(
      (900L, Seq(0.98f, 0.02f, 0f, 0f)),
      (901L, Seq(0f, 1f, 0f, 0f)))
      .toDF("bid", "vec")
    val got = Text.decontaminateSemantic(corpusE, bench,
        "doc_id", "embedding", "vec", threshold = 0.9)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2))).toSeq
    // doc 0 vs 900: cos = .98/sqrt(.98²+.02²) ≈ .999792 → flagged
    assert(got(0)._1 == 0L && got(0)._2 && got(0)._3 > 0.999)
    // doc 1: max is vs 901 at 0.6 — below 0.9
    assert(got(1) == ((1L, false, 0.6)))
    assert(got(2)._1 == 2L && !got(2)._2 && got(2)._3 < 0.05)
    // zero-only benchmark: flags nothing, max_cosine null
    val zeroB = Seq((1L, Seq(0f, 0f, 0f, 0f))).toDF("bid", "vec")
    val z = Text.decontaminateSemantic(corpusE, zeroB,
      "doc_id", "embedding", "vec", threshold = 0.5)
    assert(z.filter(col("contaminated")).count() == 0)
    assert(z.filter(col("max_cosine").isNotNull).count() == 0)
    // mixed benchmark dimensions reject loudly
    val mixed = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f, 0f)))
      .toDF("bid", "vec")
    assertThrows[IllegalArgumentException] {
      Text.decontaminateSemantic(corpusE, mixed,
        "doc_id", "embedding", "vec", threshold = 0.5)
    }
    // a NULL benchmark embedding is dropped (matches nothing), not NPE
    val withNull = Seq((900L, Some(Seq(0.98f, 0.02f, 0f, 0f))),
      (901L, Option.empty[Seq[Float]])).toDF("bid", "vec")
    val gn = Text.decontaminateSemantic(corpusE, withNull,
        "doc_id", "embedding", "vec", threshold = 0.9)
      .orderBy("doc_id").collect()
    assert(gn(0).getBoolean(1) && !gn(1).getBoolean(1))
    // a NULL ELEMENT inside a benchmark vector rejects loudly
    // (ADVICE r15) — a reference vector must be fully defined; the
    // old path NPE'd in toArray with no pointer at the cause
    val withNullElem = Seq((900L, Seq[java.lang.Float](0.98f, null,
      0f, 0f))).toDF("bid", "vec")
    val nee = intercept[IllegalArgumentException] {
      Text.decontaminateSemantic(corpusE, withNullElem,
        "doc_id", "embedding", "vec", threshold = 0.9)
    }
    assert(nee.getMessage.contains("null element"))
    // a WRONG-DIMENSION corpus vector is a different model's output:
    // max_cosine (and contaminated) come back NULL, never a
    // truncated-arithmetic verdict
    val mixedCorpus = corpusE.unionByName(
      Seq((9L, Seq(1f, 0f))).toDF("doc_id", "embedding"))
    val md = Text.decontaminateSemantic(mixedCorpus, bench,
        "doc_id", "embedding", "vec", threshold = 0.9)
      .filter(col("doc_id") === 9L).head()
    assert(md.isNullAt(1) && md.isNullAt(2))
  }

  test("decontaminateSemantic: interpreted eval matches codegen " +
      "(MaxCosine nullSafeEval ≡ doGenCode)") {
    import graft.functions.GraftFunctions.max_cosine
    val refs = Array(1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    val nrms = Array(1.0, 1.0)
    val df = Seq((1L, Seq(0.6f, 0.8f, 0f, 0f)), (2L, Seq(0f, 0f, 1f, 0f)))
      .toDF("id", "v")
    val expr = max_cosine(col("v"), refs, nrms, 4)
    val compiled = df.select(col("id"), expr.as("m"))
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try df.select(col("id"), expr.as("m"))
        .orderBy("id").collect().map(_.getDouble(1)).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(compiled == Seq(0.8, 0.0))
    assert(interpreted == compiled)
  }
}
