package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences — the standard pretraining-data step between curation and
  * tokenized-batch writing (each output sequence concatenates whole
  * documents up to `budget` tokens; the remainder is padding).
  *
  * Algorithm: GREEDY FILL in document order within a SHARD. Greedy
  * packing is inherently sequential (each decision depends on the
  * running fill), so the distribution axis is a deterministic
  * content-hash shard ([[Sampling.hashBucket]] — engine- and
  * partitioning-independent): one shuffle to co-locate each shard, then
  * a single sorted streaming pass per shard. This is the documented
  * `mapPartitions` tier (SURVEY §4.4 d): per-partition imperative logic
  * that no relational operator expresses — a window cumulative sum
  * cannot model the RESET at each bin boundary.
  *
  * Scale: shuffle volume is (id, shard, tokens) — three numeric columns,
  * independent of text size. Parallelism = `shards` (pick ≥ cluster
  * cores; packing quality is unaffected since sequences never span
  * shards). The pass is O(docs/shard) with O(1) state: no buffering, no
  * driver involvement, spill-free. Docs exceeding the budget get a
  * sequence of their own (callers wanting hard truncation should split
  * upstream).
  *
  * Determinism: shard assignment is a pure hash of the id, docs are
  * processed in ascending id order within each shard, and partitions
  * hold whole shards — the output is a pure function of the input
  * regardless of cluster layout, so any engine (the DuckDB oracle via a
  * recursive CTE) reproduces it bit-for-bit.
  */
object Packing {

  /** Pack `docs` into sequences of at most `budget` tokens per shard.
    *
    * Returns one row per doc: (idCol, shard, seq_id, seq_pos, n_tokens)
    * — seq_id numbers sequences within the shard from 0, seq_pos numbers
    * docs within their sequence from 0; n_tokens echoes the token count
    * so [[packStats]] aggregates without a join back.
    */
  def packGreedy(docs: DataFrame, idCol: String, tokensCol: Column,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        Sampling.hashBucket(col(idCol), shards).cast("int").as("shard"),
        tokensCol.cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        // a partition holds one or more WHOLE shards, sorted by
        // (shard, id): reset the fill state at each shard change
        var shard = Int.MinValue
        var seq = 0L
        var pos = 0L
        var fill = 0L
        it.map { case (id, s, tok) =>
          if (s != shard) { shard = s; seq = 0L; pos = 0L; fill = 0L }
          else if (fill + tok > budget && fill > 0) {
            seq += 1L; pos = 0L; fill = 0L
          }
          fill += tok
          val out = (id, s, seq, pos, tok)
          pos += 1L
          out
        }
      }
      .toDF(idCol, "shard", "seq_id", "seq_pos", "n_tokens")
  }

  /** MATERIALIZE trainer-ready packed sequences: one row per training
    * sequence, carrying the concatenated TOKEN-ID stream of its whole
    * documents with an EOS id after every document — the artifact a
    * pretraining data pipeline actually hands to the trainer, one step
    * past [[packGreedy]]'s doc→sequence assignment.
    *
    * `symsCol` is each document's subword-symbol array in reading order
    * (e.g. [[Text.bpeSymbols]] under a fixed merge list). Ids are the
    * 1-based position of each symbol in the CORPUS-DERIVED vocabulary
    * (distinct symbols, byte-order sorted — deterministic and
    * replayable by any engine); EOS is id 0, so no scalar "vocab size"
    * has to flow through the plan. A document's token cost is
    * `len(syms) + 1` (its EOS counts against the budget), so budgets
    * mean exactly "ids per sequence"; empty documents cost 1.
    *
    * Plan shape (the packGreedy discipline, one text-sized shuffle):
    *   1. a bounded vocab job — distinct symbols, sorted, collected
    *      under `vocabCap` with a loud failure past it (the documented
    *      capped-metadata-collect tier: a tokenizer vocabulary is
    *      model-sized by construction, 30-50k in production);
    *   2. ids as a pure plan-inlined projection (`array_position`
    *      against the literal vocab — no join; linear in vocab size
    *      per token, fine to a few-hundred-symbol demo vocab. A
    *      production 50k vocab swaps in a broadcast-hash-map
    *      mapPartitions tier, the [[graft.extra.Text.bpeTokenCountsTyped]]
    *      pattern — same output by construction);
    *   3. ONE repartition on the content-hash shard carrying (id,
    *      shard, n_tokens, ids) — the unavoidable movement: sequences
    *      ARE co-located token payloads — then the same sorted
    *      streaming fill as [[packGreedy]], emitting one row per
    *      CLOSED sequence. No join back, no second shuffle, no
    *      group-by: a sequence is a contiguous run of the sorted
    *      partition, so the pass needs O(budget) state.
    *
    * Output: (shard, seq_id, n_docs, n_tokens, token_ids) with
    * token_ids the comma-joined id stream — a string both engines
    * produce byte-identically, which is what puts a trainer-facing
    * ARTIFACT (not just its assignment) behind the DuckDB hash gate.
    */
  def packExamples(docs: DataFrame, idCol: String, symsCol: Column,
      budget: Long, shards: Int, vocabCap: Int = 65536): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    require(vocabCap > 0, "vocabCap must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // null symbol arrays (null text upstream) pack as EMPTY documents
    // (one EOS) rather than poisoning the typed pass.
    // PERSISTED (r16): the encoded frame feeds TWO actions — the vocab
    // collect and the id-projection main run — and `symsCol` is
    // typically the expensive tokenizer encode; without the pin the
    // whole encode pass ran twice (measured ~2 s of this query's cost
    // at sf0.1). Released after the output materializes below.
    val enc = docs.select(col(idCol).cast("long").as("id"),
      coalesce(symsCol, array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)))
        .as("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: the vocab-cap throw below must not leak the pin
    // past the call (the cache-hygiene contract DedupSpec asserts)
    try {
    // vocab job: bounded metadata, capped loudly — NOT a data collect.
    // Sorted by Spark's UTF8String binary order = UTF-8 byte order,
    // the collation DuckDB's ORDER BY replays.
    val vocab = enc.select(explode(col("syms")).as("sym")).distinct()
      .orderBy("sym").limit(vocabCap + 1).as[String].collect()
    if (vocab.length > vocabCap)
      throw new IllegalArgumentException(
        s"symbol vocabulary exceeds vocabCap=$vocabCap — a runaway " +
          "vocab means the symbol column is not a tokenizer output " +
          "(raise the cap only for a genuinely larger vocabulary)")
    val vocabLit = array(vocab.map(lit(_)): _*)
    val ids = concat(
      transform(col("syms"), x => array_position(vocabLit, x)),
      array(lit(0L))) // EOS = 0 after every doc, budget-counted
    val packed = enc.select(col("id"),
        Sampling.hashBucket(col("id"), shards).cast("int").as("shard"),
        (size(col("syms")) + 1).cast("long").as("n_tokens"),
        ids.as("ids"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Int, Long, Seq[Long])]
      .mapPartitions { it =>
        // a partition holds whole shards sorted by (shard, id); a
        // sequence is a contiguous run, so emit rows as bins CLOSE —
        // O(budget) state, no buffering of the partition
        val in = it.buffered
        new Iterator[(Int, Long, Long, Long, String)] {
          private var shard = Int.MinValue
          private var seqId = -1L
          def hasNext: Boolean = in.hasNext
          def next(): (Int, Long, Long, Long, String) = {
            val (_, s0, t0, ids0) = in.next()
            if (s0 != shard) { shard = s0; seqId = 0L } else seqId += 1L
            var nDocs = 1L
            var fill = t0
            val sb = new java.lang.StringBuilder
            sb.append(ids0.mkString(","))
            while (in.hasNext && in.head._2 == s0 &&
                fill + in.head._3 <= budget) {
              val (_, _, t, idsN) = in.next()
              sb.append(',').append(idsN.mkString(","))
              nDocs += 1L
              fill += t
            }
            (s0, seqId, nDocs, fill, sb.toString)
          }
        }
      }
      .toDF("shard", "seq_id", "n_docs", "n_tokens", "token_ids")
    // eagerly materialize so the pinned encode can be released in the
    // finally — the house cache-lifecycle rule (nothing stays cached
    // past the call, success OR failure)
    Dedup.materialize(packed)
    } finally enc.unpersist(blocking = false)
  }

  /** Per-sequence packing summary: docs per sequence, token fill, and
    * fill ratio against the budget — the utilization report a packing
    * job ships with. Pure one-shuffle aggregation over [[packGreedy]]'s
    * output joined back to the token counts (callers pass the same
    * frame).
    */
  def packStats(packed: DataFrame, tokensCol: String, budget: Long): DataFrame =
    packed.groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("seq_tokens"))
      .withColumn("fill_ratio",
        round(least(col("seq_tokens"), lit(budget)).cast("double") / budget, 6))
}
