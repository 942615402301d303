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
