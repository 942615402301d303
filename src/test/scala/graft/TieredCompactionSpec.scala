package graft

import graft.extra.{IndexManifests, SubstrIndex}

/** The r15-verdict-#1 contract for the LSM indexes' auto-compaction:
  * size-TIERED minor merges ([[IndexManifests.pickTier]] behind every
  * index's `autoCompactFanout`) must bound per-append merge work by
  * the TIER — never the index — while holding the live segment count
  * O(log N) over a long ingest, with replay safety and verdict
  * equivalence intact. Two layers:
  *
  *   - the POLICY, pinned pure on [[IndexManifests.pickTier]] over a
  *     simulated 1000-append ladder (every pick exactly `fanout`
  *     segments, picked bytes bounded by fanout · factor · smallest,
  *     stable count logarithmic);
  *   - the INTEGRATION, pinned on a real 100-append
  *     [[SubstrIndex]] ingest (manifest history shows every merge
  *     folding ≤ fanout segments, final count ≪ append count, ledger
  *     replay no-ops, dedup verdicts equal a fresh single-build twin).
  */
class TieredCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_tiered_")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("pickTier policy over 1000 simulated equal-size appends: every " +
      "merge folds exactly fanout segments of one size tier (input " +
      "bounded by the tier, never the index) and the stable segment " +
      "count is logarithmic") {
    val fanout = 4
    val factor = 4.0
    var segs = Map.empty[String, Long]
    var next = 0
    var maxCount = 0
    var maxPickedBytes = 0L
    for (i <- 0 until 1000) {
      segs += (s"seg-a$i" -> 100L) // one micro-batch segment, 100 units
      // the auto path: one pick per append, no cascade
      val picked = IndexManifests.pickTier(segs.toSeq, fanout, factor)
      if (picked.nonEmpty) {
        assert(picked.size == fanout,
          s"pick of ${picked.size} segments at append $i")
        val bytes = picked.map(segs).sum
        val smallest = picked.map(segs).min
        assert(bytes <= (fanout * factor * smallest).toLong,
          s"merge input $bytes exceeds the tier bound at append $i")
        // the index's total is ~100·i units here — a FULL merge would
        // be unbounded in i; the tier bound must stay flat for the
        // dominant (tier-0) merges, so track the overall max instead
        maxPickedBytes = math.max(maxPickedBytes, bytes)
        segs --= picked
        segs += (s"seg-m$next" -> bytes)
        next += 1
      }
      maxCount = math.max(maxCount, segs.size)
    }
    // O(log N): < fanout live segments per tier, ~log_factor(1000/1)
    // tiers of merged sizes (100, 400, 1600, ...) — far below the
    // 1000 an unmerged ingest would hold
    assert(segs.size <= fanout * 8,
      s"stable count ${segs.size} not logarithmic")
    assert(maxCount <= fanout * 8, s"transient count $maxCount unbounded")
    // the largest single merge is the top full tier (fanout segments
    // of the biggest merged size present), orders below the corpus
    assert(maxPickedBytes < 100L * 1000,
      s"a merge consumed $maxPickedBytes — the whole index")
  }

  test("pickTier returns empty when no size tier is full, and rejects " +
      "a fanout below 2") {
    assert(IndexManifests.pickTier(Nil, 3).isEmpty)
    assert(IndexManifests.pickTier(
      Seq("a" -> 10L, "b" -> 11L), 3).isEmpty)
    // three sizes in distinct tiers (ratio > factor): nothing to merge
    // even at fanout 2 — a full merge would have taken all three
    assert(IndexManifests.pickTier(
      Seq("a" -> 10L, "b" -> 100L, "c" -> 1000L), 2, 4.0).isEmpty)
    // but a full SMALL tier merges without touching the big segment
    assert(IndexManifests.pickTier(
      Seq("a" -> 10L, "b" -> 12L, "c" -> 1000L), 2, 4.0).toSet ==
      Set("a", "b"))
    assertThrows[IllegalArgumentException](
      IndexManifests.pickTier(Seq("a" -> 1L), 1))
  }

  test("100-append SubstrIndex ingest with autoCompactFanout=4: every " +
      "manifest-recorded merge folds <= fanout segments, the final " +
      "count is logarithmic, the ledger replays to a no-op, and " +
      "verdicts equal a fresh single-build twin") {
    val dir = tmpDir()
    val corpus = Seq((0L, "seed corpus shared run alpha beta gamma " +
      "delta epsilon zeta eta")).toDF("doc_id", "text")
    SubstrIndex.build(corpus, "doc_id", "text", dir, k = 5,
      hashed = true)
    val fanout = 4
    def batchDf(b: Int) = Seq((1000L + b,
      s"append $b distinct words q${b}a q${b}b q${b}c q${b}d q${b}e"))
      .toDF("doc_id", "text")
    for (b <- 0 until 100)
      SubstrIndex.append(batchDf(b), "doc_id", "text", dir,
        txn = Some(("tier", b.toLong)), autoCompactFanout = fanout)
    // walk the full committed history: every version that REMOVED
    // segments is a merge; its input count (removed + the one added)
    // must be <= fanout — never the whole index
    val vs = IndexManifests.versions(spark, dir)
    val hist = vs.map(v =>
      IndexManifests.at(spark, dir, v).getOrElse("grams", Nil).toSet)
    val merges = hist.sliding(2).toSeq.collect {
      case Seq(prev, cur) if (prev -- cur).nonEmpty => (prev -- cur).size
    }
    assert(merges.nonEmpty, "a 100-append ingest never merged")
    assert(merges.max <= fanout,
      s"a merge folded ${merges.max} segments (> fanout $fanout)")
    val finalCount = hist.last.size
    assert(finalCount <= fanout * 5,
      s"final segment count $finalCount not logarithmic in 100 appends")
    // replay safety through the minor merges: the last committed batch
    // re-offered is a no-op
    val v = IndexManifests.latest(spark, dir).get._1
    SubstrIndex.append(batchDf(99), "doc_id", "text", dir,
      txn = Some(("tier", 99L)), autoCompactFanout = fanout)
    assert(IndexManifests.latest(spark, dir).get._1 == v)
    // verdict equivalence: a probe repeating append-42's content (and
    // the seed run) is cut identically by the tiered index and a twin
    // built fresh over the identical corpus
    val twin = tmpDir()
    val union = (corpus +: (0 until 100).map(batchDf))
      .reduce(_ unionByName _)
    SubstrIndex.build(union, "doc_id", "text", twin, k = 5,
      hashed = true)
    val probe = Seq(
      (5000L, "append 42 distinct words q42a q42b q42c q42d q42e"),
      (5001L, "seed corpus shared run alpha beta gamma delta " +
        "epsilon zeta eta"),
      (5002L, "completely novel probe content nothing indexed before"))
      .toDF("doc_id", "text")
    def rows(d: String) = SubstrIndex.dedupBatch(spark, d, probe,
        "doc_id", "text")
      .select("doc_id", "text", "n_spans_removed", "n_tokens_removed")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val tiered = rows(dir)
    assert(tiered == rows(twin))
    assert(tiered.exists(_.contains("5002,completely novel probe " +
      "content nothing indexed before,0,0")))
  }
}
