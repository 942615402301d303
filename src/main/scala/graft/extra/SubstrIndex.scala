package graft.extra

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted duplicated-gram posting index — the INCREMENTAL arm of
  * ExactSubstr span dedup (r13 verdict #1, the operator a 100 TB
  * pipeline actually runs daily): the corpus' positioned k-grams are
  * aggregated ONCE into per-gram posting summaries and persisted;
  * each new crawl batch is then span-deduped against the corpus ∪ its
  * own batch-mates via batch-driven (gram → count, canonical
  * occurrence) lookups — the corpus TEXT is never rescanned,
  * re-tokenized, or re-hashed. Lee et al. 2022 (arXiv:2107.06499) as
  * deployed: dedup the standing corpus once, then dedup each
  * incremental batch against it.
  *
  * Layout under `dir` ([[IndexManifests]] — the same manifest-commit,
  * CAS, vacuum, restore, and exactly-once-ledger discipline as
  * [[AnnIndex]]/[[Bm25Index]]):
  *   - `grams/seg-N/` — (g, n, d, p) parquet PARTIALS per write: gram
  *     key, occurrence count, minimal (doc, pos) occurrence. Readers
  *     aggregate partials (sum n, min (d, p)) — the LSM shape, so an
  *     [[append]] is one batch aggregation + one segment write and
  *     never rewrites the corpus postings; [[compact]] merges on the
  *     maintenance cadence.
  *   - `meta/` — one row (k, hashed): the gram geometry, immutable
  *     (an index answers queries only for its own k).
  *
  * EXACT-vs-HASHED keys: `hashed = true` stores xxhash64(gram) —
  * 8 bytes per posting instead of ~k words, the production form (a
  * collision can only ADD a false span anchor at ~n²/2⁶⁵ odds);
  * `hashed = false` stores the gram string so an external engine (the
  * oracle) can replay the grouping exactly. SubstrIndexSpec pins the
  * two forms equivalent on collision-free corpora.
  *
  * Scale shape of [[dedupBatch]]: the batch tokenizes once
  * (O(batch tokens) gram rows); the index participates through ONE
  * keyed semi-join of its posting scan against the batch's distinct
  * gram keys — the shuffle carries only matching postings
  * (O(batch-distinct grams)), and at production the posting store is
  * bucketed by gram key so the index side of that join is
  * shuffle-free (SCALE.md). Span merge + cut are per-batch-document
  * windows, bounded by doc length. Nothing in the per-batch cost is
  * proportional to corpus TEXT; the posting scan is columnar over
  * 3–4 longs per distinct gram.
  *
  * INGEST ORDER contract: dedupBatch FIRST, then [[append]] the
  * CLEANED batch (the frame dedupBatch returned) — appending raw
  * batch grams would register content that was just cut, making later
  * batches treat it as present. Ids must be globally unique across
  * corpus ∪ batches (the standard keyed-table contract), and for full
  * dedup they should be MONOTONE (new batches above corpus ids):
  * canonicality is min (doc, pos) under the id's NATIVE ordering, and
  * a batch id sorting BELOW a corpus id pulls the canonical into the
  * batch — the batch copy is then kept while the corpus copy, which
  * incremental mode never touches, survives too (batch-row verdicts
  * still match the global operator exactly; spec-pinned on a
  * lexicographic inversion fixture).
  */
object SubstrIndex {

  private val Frames = Seq("grams")

  // the canonical struct keeps the id's NATIVE type: casting (e.g. to
  // long) would null out string ids — silently disabling every cut —
  // and rank numeric strings differently than removeDupSpans' native
  // min(struct) ordering. Corpus and batch id types must match (the
  // usual keyed contract).
  private def partialOf(docs: DataFrame, idCol: String, textCol: String,
      k: Int, hashed: Boolean): DataFrame =
    Dedup.positionedGrams(docs, idCol, textCol, k, hashed)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        min(struct(col(idCol).as("d"),
          col("pos").as("p"))).as("__c"))
      .select(col("__g").as("g"), col("n"),
        col("__c.d").as("d"), col("__c.p").as("p"))

  /** Gram geometry of a committed index. */
  def meta(spark: SparkSession, dir: String): (Int, Boolean) = {
    val r = spark.read.parquet(s"$dir/meta").head()
    (r.getAs[Int]("k"), r.getAs[Boolean]("hashed"))
  }

  /** Build the posting index over the standing corpus — one gram
    * aggregation (the identical keyed groupBy [[Dedup.exactSubstrSpans]]
    * runs), one segment write, one manifest commit. Overwrite
    * semantics: the fresh manifest names only the new segment.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      dir: String, k: Int = 5, hashed: Boolean = false): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prev = IndexManifests.latest(spark, dir)
    // the meta file lives OUTSIDE the manifest commit, so a geometry
    // change over a live index would pair the new (k, hashed) with the
    // old committed segments — and a k mismatch doesn't error, it
    // silently matches nothing. Geometry changes therefore require a
    // fresh directory; a same-geometry rebuild skips the meta write
    // entirely (below), so no reader can ever catch it half-written.
    prev.foreach { _ =>
      val (k0, h0) = meta(spark, dir)
      require(k0 == k && h0 == hashed,
        s"index at $dir is committed with k=$k0/hashed=$h0; " +
          s"rebuilding with k=$k/hashed=$hashed needs a fresh dir")
    }
    val v = prev.map(_._1).getOrElse(0L) + 1
    val seg = f"grams/seg-$v%09d"
    partialOf(docs, idCol, textCol, k, hashed)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$seg")
    // write meta ONLY on the first build: the guard above already
    // proved a rebuild's geometry identical, and re-Overwriting would
    // open a delete-then-write window where a concurrent reader's
    // meta() read finds no files (the atomic-manifest discipline
    // protects segments, not this side file)
    if (prev.isEmpty)
      Seq((k, hashed)).toDF("k", "hashed")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    // the applied-batch ledger survives a same-geometry rebuild, like
    // compact's carry-forward: dropping it would let a stream replay
    // re-apply its last batch against the rebuilt corpus
    val entries = Map("grams" -> Seq(seg)) ++
      prev.flatMap(_._2.get(IndexManifests.TxnFrame))
        .map(IndexManifests.TxnFrame -> _).toMap
    IndexManifests.commit(spark, dir, v, entries)
    IndexManifests.vacuum(spark, dir, Frames)
  }

  /** LSM-append a batch's gram partials (normally the CLEANED batch —
    * see the ingest-order contract above): one aggregation over the
    * batch, one new segment, one manifest commit; existing postings
    * are never rewritten (compaction corrects the segment count).
    * `txn` is the exactly-once applied-batch ledger
    * ([[IndexManifests.txnApplied]]) for streaming ingest.
    */
  def append(batch: DataFrame, idCol: String, textCol: String,
      dir: String, txn: Option[(String, Long)] = None): Unit = {
    val spark = batch.sparkSession
    val (v0, entries) = IndexManifests.requireLatest(spark, dir, "substr")
    if (txn.exists { case (sid, b) =>
        IndexManifests.txnApplied(entries, sid, b) }) return
    val (k, hashed) = meta(spark, dir)
    val seg = f"grams/seg-${v0 + 1}%09d"
    partialOf(batch, idCol, textCol, k, hashed)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$seg")
    val withSeg = entries +
      ("grams" -> (entries.getOrElse("grams", Nil) :+ seg))
    IndexManifests.commit(spark, dir, v0 + 1,
      txn.fold(withSeg) { case (sid, b) =>
        IndexManifests.withTxn(withSeg, sid, b) })
  }

  private def readPostings(spark: SparkSession, dir: String,
      entries: Map[String, Seq[String]]): DataFrame = {
    val segs = entries.getOrElse("grams", Nil)
    require(segs.nonEmpty, s"no committed gram segments at $dir")
    spark.read.parquet(segs.map(s => s"$dir/$s"): _*)
  }

  /** Merge accumulated partials into one segment (same retention
    * contract as [[AnnIndex.compact]]; the txn ledger carries
    * forward).
    */
  def compact(spark: SparkSession, dir: String,
      retainVersions: Int = 1): Unit = {
    val (v0, entries) = IndexManifests.requireLatest(spark, dir, "substr")
    val seg = f"grams/seg-${v0 + 1}%09d"
    readPostings(spark, dir, entries)
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n"),
        min(struct(col("d"), col("p"))).as("__c"))
      .select(col("g"), col("n"), col("__c.d").as("d"),
        col("__c.p").as("p"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$seg")
    val fresh = Map("grams" -> Seq(seg)) ++
      entries.get(IndexManifests.TxnFrame)
        .map(IndexManifests.TxnFrame -> _).toMap
    IndexManifests.commit(spark, dir, v0 + 1, fresh)
    IndexManifests.vacuum(spark, dir, Frames,
      keepVersions = retainVersions)
  }

  /** Span-dedup a NEW batch against the indexed corpus and the batch's
    * own mates, WITHOUT rescanning corpus text — output is IDENTICAL
    * to [[Dedup.removeDupSpans]] over corpus ∪ batch restricted to the
    * batch's rows (SubstrIndexSpec pins the equivalence; the identity
    * holds because a batch position's flag depends only on the gram's
    * TOTAL count and GLOBAL canonical minimum, both of which the
    * posting summaries carry exactly):
    *
    *   1. batch grams (one tokenization), aggregated per gram key;
    *   2. posting lookup: the index scan semi-joins the batch's
    *      distinct gram keys (only matches shuffle), partials
    *      aggregate to (corpus count, corpus canonical);
    *   3. total = corpus + batch count; canonical = min of the two
    *      sides; batch positions ≠ canonical with total ≥ 2 flag;
    *   4. canonical occurrences landing IN batch docs protect their
    *      positions; [[Dedup.cutFlaggedSpans]] merges, filters by
    *      `minSpanTokens`, cuts, rebuilds.
    *
    * Output per batch doc: `text`, `n_spans_removed`,
    * `n_tokens_removed` — [[Dedup.removeDupSpans]]'s exact shape.
    */
  def dedupBatch(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String,
      minSpanTokens: Int = 0): DataFrame = {
    val (_, entries) = IndexManifests.requireLatest(spark, dir, "substr")
    val (k, hashed) = meta(spark, dir)
    val grams = Dedup.positionedGrams(batch, idCol, textCol, k, hashed)
    val batchAgg = grams.groupBy(col("__g"))
      .agg(count(lit(1)).as("bn"),
        min(struct(col(idCol).as("d"),
          col("pos").as("p"))).as("bm"))
    val matched = readPostings(spark, dir, entries)
      .join(batchAgg.select(col("__g").as("g")).distinct(), "g")
      .groupBy(col("g"))
      .agg(sum(col("n")).as("cn"),
        min(struct(col("d"), col("p"))).as("cm"))
    val per = batchAgg
      .join(matched.withColumnRenamed("g", "__g"), Seq("__g"), "left")
      .select(col("__g"),
        (coalesce(col("cn"), lit(0L)) + col("bn")).as("tot"),
        when(col("cm").isNull, col("bm"))
          .otherwise(least(col("cm"), col("bm"))).as("canon"))
      .filter(col("tot") >= 2L)
    val flagged = grams.join(per, "__g")
      .filter(!(col(idCol) === col("canon.d") &&
        col("pos") === col("canon.p")))
      .select(col(idCol), col("pos"))
    // canonical occurrences inside BATCH docs (a gram absent from the
    // corpus but shared by batch-mates anchors its canonical here):
    // protect them, exactly as the global operator does
    val protectPos = per
      .select(col("canon.d").as(idCol), col("canon.p").as("pos"))
      .join(batch.select(col(idCol)).distinct(), Seq(idCol))
      .distinct()
    val base = batch.select(col(idCol),
      Text.tokens(col(textCol)).as("__toks"))
    Dedup.cutFlaggedSpans(base, flagged, protectPos, idCol, k,
      minSpanTokens)
  }
}
