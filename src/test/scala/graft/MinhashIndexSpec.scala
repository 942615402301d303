package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.extra.{Dedup, MinhashIndex}

/** Persisted MinHash band index: a batch verdicted against the index
  * must equal [[Dedup.nearDupIncremental]] over the same corpus/batch
  * split — the equivalence the design rests on — plus the LSM
  * lifecycle, file pruning (proved physically), and replay safety.
  */
class MinhashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_minhidx_")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def rows(df: DataFrame) = df
    .select("doc_id", "is_dup", "dup_of")
    .orderBy("doc_id").collect()
    .map(r => (r.getLong(0), r.getBoolean(1),
      if (r.isNullAt(2)) -1L else r.getLong(2)))
    .toSeq

  // corpus doc 0 has a near-copy in the batch (100); 101/102 are
  // batch-mates of each other; 103 is clean
  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight again"),
    (1L, "completely different corpus content with other words here"),
    (2L, "a third corpus document about storage engines and parquet"))
    .toDF("doc_id", "text")
  private val batch = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight folks"),
    (101L, "fresh shared run alpha beta gamma delta epsilon zeta eta"),
    (102L, "fresh shared run alpha beta gamma delta epsilon zeta theta"),
    (103L, "totally unrelated clean batch document nothing shared"))
    .toDF("doc_id", "text")

  private def globalRef(c: DataFrame, b: DataFrame) =
    rows(Dedup.nearDupIncremental(c, b, "doc_id", "text",
      numPerms = 16, rowsPerBand = 4, shingleN = 3, threshold = 0.5))

  test("dedupBatch == nearDupIncremental on planted corpus-dup, " +
      "batch-mate-dup, and clean fixtures") {
    val dir = tmpDir()
    MinhashIndex.build(corpus, "doc_id", "text", dir)
    val inc = rows(MinhashIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text"))
    assert(inc == globalRef(corpus, batch))
    val byId = inc.map(t => t._1 -> t).toMap
    assert(byId(100L)._2 && byId(100L)._3 == 0L, "corpus near-dup")
    assert(!byId(101L)._2, "lower batch-mate is canonical")
    assert(byId(102L)._2 && byId(102L)._3 == 101L, "batch-mate dup")
    assert(!byId(103L)._2, "clean doc")
  }

  test("LSM lifecycle: appended survivors become corpus for the next " +
      "batch; replayed append (txn) is a no-op; compact preserves " +
      "verdicts") {
    val dir = tmpDir()
    MinhashIndex.build(corpus, "doc_id", "text", dir)
    // ingest batch 1's KEPT docs (the non-dups)
    val v1 = MinhashIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text")
    val keptIds = rows(v1).filter(!_._2).map(_._1)
    val kept = batch.filter(col("doc_id").isin(keptIds: _*))
    MinhashIndex.append(kept, "doc_id", "text", dir,
      txn = Some(("s", 0L)))
    val vAfter = graft.extra.IndexManifests.latest(spark, dir).get._1
    MinhashIndex.append(kept, "doc_id", "text", dir,
      txn = Some(("s", 0L)))                                   // replay
    assert(graft.extra.IndexManifests.latest(spark, dir).get._1
      == vAfter)
    // batch 2 repeats a SURVIVOR (101's run) → now a corpus dup
    val batch2 = Seq(
      (200L, "fresh shared run alpha beta gamma delta epsilon zeta eta"),
      (201L, "yet another clean follow up document entirely new words"))
      .toDF("doc_id", "text")
    val inc2 = rows(MinhashIndex.dedupBatch(spark, dir, batch2,
      "doc_id", "text"))
    val standing = corpus.unionByName(kept.select("doc_id", "text"))
    assert(inc2 == globalRef(standing, batch2))
    assert(inc2.find(_._1 == 200L).get._2)
    MinhashIndex.compact(spark, dir)
    assert(rows(MinhashIndex.dedupBatch(spark, dir, batch2,
      "doc_id", "text")) == inc2)
  }

  test("band-file pruning: a small batch opens a strict subset of the " +
      "posting files — proved physically by corrupting every pruned " +
      "bands AND sets file — with verdicts bit-identical") {
    val rnd = new scala.util.Random(99)
    val vocab = (0 until 500).map(i => s"v$i")
    val wide = (0L until 150L).map { id =>
      (id, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val dir = tmpDir()
    MinhashIndex.build(wide, "doc_id", "text", dir, numFiles = 16)
    // tiny batch: a near-copy of doc 0 (one token swapped)
    val base = wide.orderBy("doc_id").head.getString(1).split(" ")
    val tiny = Seq((900L, (base.dropRight(1) :+ "zzz").mkString(" ")))
      .toDF("doc_id", "text")
    val ref = globalRef(wide, tiny)
    val (selected, total) = MinhashIndex.probeBandFiles(spark, dir,
      tiny, "doc_id", "text")
    assert(total >= 16 && selected.size < total,
      s"no pruning: ${selected.size} of $total")
    // corrupt every bands file pruning excluded AND every sets file
    // whose d-range excludes the candidate ids (0 is the only corpus
    // candidate, so files covering only higher ids must never open)
    val (_, _, ranges) =
      graft.extra.IndexManifests.latestFull(spark, dir).get
    val selSet = selected.toSet
    val prunedBands = ranges.keys.filter(_.startsWith("bands/"))
      .map(f => s"$dir/$f").filterNot(selSet)
    assert(prunedBands.nonEmpty)
    val prunedSets = ranges.collect {
      case (f, (mn, mx)) if f.startsWith("sets/") &&
        (mn.toLongOption.exists(_ > 0L) || mx.toLongOption.exists(_ < 0L))
        => s"$dir/$f"
    }
    assert(prunedSets.nonEmpty, "doc 0's id must prune most sets files")
    (prunedBands ++ prunedSets).foreach { f =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f.stripPrefix("file:")),
        "NOT A PARQUET FILE".getBytes): Unit
    }
    assert(rows(MinhashIndex.dedupBatch(spark, dir, tiny,
      "doc_id", "text")) == ref)
    assert(ref.head._2 && ref.head._3 == 0L)
  }

  test("auto-compaction bounds the segment count across a 10-batch " +
      "ingest with replay safety intact") {
    val dir = tmpDir()
    MinhashIndex.build(corpus, "doc_id", "text", dir)
    def segCount() = graft.extra.IndexManifests.latest(spark, dir)
      .get._2("bands").size
    for (b <- 0 until 10) {
      val df = Seq((1000L + b,
        s"batch $b body with words w${b}a w${b}b w${b}c w${b}d"))
        .toDF("doc_id", "text")
      MinhashIndex.append(df, "doc_id", "text", dir,
        txn = Some(("auto", b.toLong)), autoCompactFanout = 3)
      // tiered bound: < fanout segments per size tier, ~log tiers
      assert(segCount() <= 7, s"unbounded at batch $b: ${segCount()}")
    }
    val v = graft.extra.IndexManifests.latest(spark, dir).get._1
    MinhashIndex.append(
      Seq((1009L, "batch 9 body with words w9a w9b w9c w9d"))
        .toDF("doc_id", "text"),
      "doc_id", "text", dir, txn = Some(("auto", 9L)),
      autoCompactFanout = 3)
    assert(graft.extra.IndexManifests.latest(spark, dir).get._1 == v)
  }

  test("seeded randomized differential: index verdicts == global " +
      "nearDupIncremental over collision-heavy corpora") {
    val rnd = new scala.util.Random(2727)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (round <- 0 until 3) {
      val mk = (id: Long) => {
        val n = 5 + rnd.nextInt(12)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val corpusR = (0L until 25L).map(mk).toDF("doc_id", "text")
      val batchR = (100L until 112L).map(mk).toDF("doc_id", "text")
      val dir = tmpDir()
      MinhashIndex.build(corpusR, "doc_id", "text", dir)
      val inc = rows(MinhashIndex.dedupBatch(spark, dir, batchR,
        "doc_id", "text", threshold = 0.3))
      val ref = rows(Dedup.nearDupIncremental(corpusR, batchR,
        "doc_id", "text", numPerms = 16, rowsPerBand = 4,
        shingleN = 3, threshold = 0.3))
      assert(inc == ref, s"round $round")
    }
  }

  test("LSM takedown: a deleted corpus doc stops anchoring verdicts " +
      "immediately (== an index built without it); compact makes the " +
      "purge physical; re-delete is a no-op") {
    val dir = tmpDir()
    MinhashIndex.build(corpus, "doc_id", "text", dir)
    // doc 0 anchors batch doc 100's verdict — delete it
    assert(MinhashIndex.delete(spark, dir,
      Seq(0L).toDF("doc_id"), "doc_id") == 1L)
    val afterDelete = rows(MinhashIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text"))
    // reference: the global operator over the SURVIVING corpus
    val survivors = corpus.filter(col("doc_id") =!= 0L)
    assert(afterDelete == globalRef(survivors, batch))
    assert(!afterDelete.find(_._1 == 100L).get._2,
      "100's only anchor was deleted — must be clean now")
    assert(afterDelete.find(_._1 == 102L).get._2,
      "batch-mate verdicts unaffected by the takedown")
    // idempotent retry
    assert(MinhashIndex.delete(spark, dir,
      Seq(0L).toDF("doc_id"), "doc_id") == 0L)
    // compact purges physically: tombstone frame gone, verdicts same
    MinhashIndex.compact(spark, dir)
    val (_, entries) = graft.extra.IndexManifests.latest(spark, dir).get
    assert(!entries.contains("tombstones"))
    val liveIds = spark.read.parquet(
        entries("sets").map(s => s"$dir/$s"): _*)
      .select("d").collect().map(_.getLong(0)).toSet
    assert(!liveIds.contains(0L))
    assert(rows(MinhashIndex.dedupBatch(spark, dir, batch,
      "doc_id", "text")) == afterDelete)
  }

  test("geometry change over a committed index is rejected") {
    val dir = tmpDir()
    MinhashIndex.build(corpus, "doc_id", "text", dir)
    val e = intercept[IllegalArgumentException] {
      MinhashIndex.build(corpus, "doc_id", "text", dir, numPerms = 32)
    }
    assert(e.getMessage.contains("needs a fresh dir"))
  }
}
