package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.extra.{Curation, Dedup, Text}

/** Ingest-time curation — the stream-safe subset of
  * [[graft.extra.Curation.curate]] applied at the door instead of after
  * storage:
  *
  *   - quality + language gates: pure projections, run per micro-batch;
  *   - exact dedup: `dropDuplicatesWithinWatermark` on the content hash —
  *     state holds one hash per unique doc inside the watermark horizon,
  *     so a replayed/duplicated document is dropped while its first copy
  *     is in flight;
  *   - NEAR-dup suppression ([[curateStreamNearDup]]): MinHash band
  *     signatures computed as pure projections, deduped per (band, sig)
  *     within the watermark, docs kept only when EVERY band was
  *     first-seen — bounded state, no all-pairs join.
  *
  * Corpus-global near-dup clustering and split assignment stay BATCH
  * concerns (they need candidate joins over all of storage); the point
  * of the streaming stage is cutting junk and copies before they ever
  * hit storage, shrinking the nightly batch curation's input.
  */
object CurationStream {

  /** Row shape of the per-band stream between the explode and the
    * stateful dedup; top-level so the Scala 2.13 encoder derivation in
    * [[curateStreamNearDup]]'s typed combine can see it.
    */
  private[streaming] final case class BandRow(
      doc_id: Long, text: String, event_time: java.sql.Timestamp,
      band: Int, sig: String)

  /** Wire schema: JSON lines `{doc_id, text, event_time_ms}`. */
  val wireSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("event_time_ms", LongType)))

  /** Stateless front of both curation streams: parse the wire JSON,
    * enrich, apply the quality/language gates. No watermark, no state —
    * callers pick their own stateful tail. Keeps `text_hash` from
    * [[Curation.enrich]] for downstream dedup keys.
    */
  private def gatedStream(raw: DataFrame, cfg: Curation.Config): DataFrame = {
    val parsed = raw
      .select(from_json(col("value"), wireSchema).as("d"))
      .select(col("d.doc_id").as("doc_id"), col("d.text").as("text"),
        timestamp_millis(col("d.event_time_ms")).as("event_time"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    Curation.enrich(parsed, "text")
      .filter(!Curation.lowQualityFlag(cfg) && !Curation.wrongLangFlag(cfg))
  }

  /** The STATELESS curation front alone — parse + enrich + quality and
    * language gates, no watermark, no dedup state. The feed for sinks
    * that do their own keyed reconciliation (or whose bench block
    * should measure the SINK's capacity, not the upstream dedup's —
    * [[graft.StreamBench.measureAnnIngest]]): exact/near dedup capacity
    * has its own block over [[curateStream]]/[[curateStreamNearDup]].
    */
  def gatedOnly(raw: DataFrame,
      cfg: Curation.Config = Curation.Config()): DataFrame =
    gatedStream(raw, cfg).select("doc_id", "text", "event_time")

  /** The gated stream CLASSIFIED under a frozen Naive Bayes model
    * ([[graft.extra.Classifier]]) — the model-based filtering stage of
    * the curation pipeline as a streaming leg: heuristic gates first
    * (cheap projections), then the trained verdict via
    * [[graft.extra.Classifier.classifyTyped]] — a pure mapPartitions
    * projection over the broadcast model table, so the stage is
    * STATELESS (no watermark, no stateful operator, append-mode
    * trivially) and bit-identical to the batch scorer. `keep` filters
    * to the named classes (None = emit all, labeled). Output:
    * (doc_id, text, event_time, predicted, score).
    */
  def classifyStream(raw: DataFrame,
      model: graft.extra.Classifier.NaiveBayesModel,
      cfg: Curation.Config = Curation.Config(),
      keep: Option[Set[String]] = None): DataFrame = {
    val scored = graft.extra.Classifier.classifyTyped(
      gatedOnly(raw, cfg), "text", model)
      .select("doc_id", "text", "event_time", "predicted", "score")
    keep.map(k => scored.filter(col("predicted").isin(k.toSeq: _*)))
      .getOrElse(scored)
  }

  /** Raw `value`-column stream → curated (doc_id, text, event_time)
    * stream: parsed, gated, exact-deduped within the watermark.
    */
  def curateStream(raw: DataFrame, cfg: Curation.Config = Curation.Config(),
      watermark: String = "10 minutes"): DataFrame =
    gatedStream(raw, cfg)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .select("doc_id", "text", "event_time")

  /** The gated stream plus IN-FLIGHT duplicate suppression, exact AND
    * near: drop a doc whose MinHash LSH bucket was already claimed by
    * an earlier doc inside the watermark horizon.
    *
    * Plan (append mode, two chained stateful operators — both
    * watermark-bounded, ONE watermark declaration; Spark disallows
    * redeclaring a watermark mid-chain, so the single declaration sits
    * after the stateless combine and before both stateful operators):
    *
    *   1. band signatures as pure projections
    *      ([[Dedup.minhashArray]] — one fold per row, no shuffle, no
    *      state), exploded to one (band, sig) row per band;
    *   2. `dropDuplicatesWithinWatermark(band, sig)` — the FIRST doc to
    *      present each bucket keeps its row; later colliding docs lose
    *      that row. State: one entry per distinct bucket in the horizon;
    *   3. per-doc reassembly: a windowed count of surviving band rows —
    *      a doc is emitted iff ALL its bands were first-seen. State: one
    *      buffer per in-flight doc until the watermark closes its
    *      window.
    *
    * EXACT duplicates need no separate `text_hash` dedup stage here: an
    * exact copy shares every shingle, hence every band signature, so it
    * collides on ALL bands and is suppressed by the same state (short
    * texts included — their salt is the content hash, see below). One
    * stateful operator fewer than dedup-then-band chaining, and the
    * watermark needs only one declaration.
    *
    * Precision/recall trade vs the batch path (documented, deliberate):
    * the batch pipeline verifies candidates with exact Jaccard and
    * clusters them corpus-globally; this stage drops on bucket collision
    * ALONE. For a true near-dup pair with shingle-Jaccard J the drop
    * probability is 1−(1−J^rowsPerBand)^numBands (the standard LSH
    * S-curve — steeper near 1 with more bands); a false bucket collision
    * between dissimilar docs (probability per band ≈ that of two
    * independent 48-bit-min runs agreeing on `rowsPerBand` minima)
    * incorrectly drops a good doc, which batch verification would have
    * kept. Suppression also only sees the watermark horizon: copies
    * arriving further apart are left for the nightly batch CC. Emission
    * latency: docs emit when the watermark passes their `emitWindow`
    * event-time window (the cost of chaining a windowed aggregation
    * after a dedup in append mode).
    *
    * Short texts whose shingle array is empty produce the all-sentinel
    * signature ([[Dedup.minhashArray]]); their band keys are salted with
    * the CONTENT hash, so two distinct short texts never collide while
    * exact copies of the same short text still suppress.
    *
    * Intra-batch determinism: when two colliding docs arrive in the SAME
    * micro-batch, `dropDuplicatesWithinWatermark` alone would pick an
    * arbitrary winner PER BAND — wins can split across bands so no doc
    * wins all its bands and every copy of the content is dropped. Before
    * the stateful dedup, each micro-batch is therefore reduced to ONE
    * candidate per (band, sig) — the min doc_id — by a stateless
    * per-partition combine after co-locating buckets with
    * `repartition(band, sig)`. Batch arrival order is then as-if sorted
    * by doc_id: the lowest-id copy claims ALL its bands and survives;
    * the combine also shrinks the stateful operator's per-batch input to
    * one row per bucket. The combine's per-partition map is bounded by
    * micro-batch size / shuffle partitions (not by stream history).
    */
  def curateStreamNearDup(raw: DataFrame,
      cfg: Curation.Config = Curation.Config(),
      watermark: String = "10 minutes",
      numPerms: Int = 8, rowsPerBand: Int = 2, shingleN: Int = 3,
      emitWindow: String = "1 minute"): DataFrame = {
    require(numPerms % rowsPerBand == 0, "numPerms % rowsPerBand != 0")
    val numBands = numPerms / rowsPerBand
    val sigs = gatedStream(raw, cfg)
      .withColumn("__mhs",
        Dedup.minhashArray(Text.shingles(col("text"), shingleN), numPerms))
    // Band structs read the materialized signature ATTRIBUTE via plain
    // element_at calls — no lambda references to the expensive fold, so
    // it is evaluated exactly once per row (HOF-CSE trap).
    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        when(element_at(col("__mhs"), 1) === lit(Dedup.MinhashP),
            concat(lit("uniq:"), col("text_hash")))
          .otherwise(concat_ws(",", (0 until rowsPerBand).map(j =>
            element_at(col("__mhs"), b * rowsPerBand + j + 1)
              .cast("string")): _*)).as("sig"))
    }
    // text rides band-0 rows ONLY: the reassembly agg needs it once per
    // doc, and an emitted doc must have won ALL bands — band 0 included
    // — so min(text) (null-skipping) always finds it. Cuts the payload
    // through both shuffles and the dedup state by ~numBands×.
    val banded = sigs
      .select(col("doc_id"), col("text"), col("event_time"),
        explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"),
        when(col("bs.band") === 0, col("text")).as("text"),
        col("event_time"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
    // Deterministic intra-batch bucket ownership (see scaladoc): one
    // min-doc_id candidate per (band, sig) per micro-batch, computed
    // statelessly per partition after co-locating buckets. The typed
    // hop erases column metadata, so the chain's ONE watermark is
    // declared on the combined rows, just before the stateful tail.
    import banded.sparkSession.implicits._
    val combined = banded.repartition(col("band"), col("sig"))
      .as[BandRow]
      .mapPartitions { it =>
        val best = collection.mutable.HashMap.empty[(Int, String), BandRow]
        it.foreach { r =>
          val cur = best.get((r.band, r.sig))
          if (cur.isEmpty || r.doc_id < cur.get.doc_id)
            best((r.band, r.sig)) = r
        }
        best.valuesIterator
      }
      .toDF()
      .withWatermark("event_time", watermark)
    combined
      .dropDuplicatesWithinWatermark("band", "sig")
      .groupBy(window(col("event_time"), emitWindow), col("doc_id"))
      .agg(count(lit(1)).as("__nb"), min("text").as("text"),
        min("event_time").as("event_time"))
      .filter(col("__nb") === numBands)
      .select("doc_id", "text", "event_time")
  }
}
