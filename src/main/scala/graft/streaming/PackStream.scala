package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING sequence packing — the trainer-ready tail of a streaming
  * curation pipeline: curated docs arrive as a stream, and training
  * sequences leave as a stream, each row a greedy-filled token-id bin
  * ([[graft.extra.Packing.packExamples]]'s output shape, produced
  * incrementally).
  *
  * Greedy packing is sequential per shard, which in a stream means the
  * OPEN BIN is operator state: `flatMapGroupsWithState` keyed on the
  * content-hash shard carries (next seq id, fill, ids of the open bin)
  * across micro-batches — O(budget) ids per shard, so the state store
  * is bounded by `shards · budget` REGARDLESS of throughput, the same
  * state discipline as [[Stateful]]'s O(1)-per-key operators. A doc
  * that does not fit the open bin CLOSES it (the closed sequence is
  * emitted downstream in Append mode) and starts the next; sequences
  * therefore materialize exactly once, as soon as they are full.
  *
  * ORDER CONTRACT: docs are applied in ascending `doc_id` order WITHIN
  * a micro-batch (arrival-layout independent, like every Stateful
  * operator); ACROSS batches arrival order is authoritative — exactly
  * [[graft.extra.Dedup]]-family streaming semantics. A single-batch
  * drive therefore reproduces the batch packer bit-for-bit
  * (spec-pinned), and a multi-batch drive equals the sequential fill
  * over the concatenation of its per-batch sorted runs.
  *
  * The vocabulary is FROZEN (a trained tokenizer's symbol→id map,
  * model-sized by construction — the frozen-codebook discipline every
  * streaming index leg here follows): a streaming job cannot derive
  * ids from a corpus it has not finished seeing. Out-of-vocabulary
  * symbols map to `oovId` (distinct from `eosId` so the EOS framing
  * stays parseable); production vocabularies are closed over their
  * byte/char alphabet, so OOV ids flag upstream tokenizer drift
  * rather than silently corrupting sequences.
  *
  * The tail bin of each shard stays OPEN in the state store (a stream
  * has no end); restarting the query resumes it from the checkpoint.
  * Callers that need a hard flush run the batch packer over the
  * residue or send `shards` sentinel oversize docs.
  */
object PackStream {

  /** One curated input doc: id + subword symbols in reading order. */
  final case class PackDoc(doc_id: Long, syms: Seq[String])

  /** Open-bin operator state for one shard. */
  final case class BinState(nextSeq: Long, nDocs: Long, fill: Long,
      ids: Seq[Long])

  /** One CLOSED training sequence (the packExamples row shape). */
  final case class SeqRow(shard: Int, seq_id: Long, n_docs: Long,
      n_tokens: Long, token_ids: String)

  /** Pack a streaming Dataset of docs into closed training sequences.
    *
    * @param docs   streaming input (use [[fromDocFrame]] for a DataFrame
    *               of (doc_id, syms))
    * @param vocab  frozen symbol→id map; ids must avoid `eosId`/`oovId`
    * @param budget max ids per sequence (each doc costs len(syms) + 1)
    * @param shards content-hash shard count = packing parallelism
    */
  def packStream(docs: Dataset[PackDoc], vocab: Map[String, Long],
      budget: Long, shards: Int, eosId: Long = 0L,
      oovId: Long = -1L): Dataset[SeqRow] = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    require(eosId != oovId, "eosId and oovId must differ")
    require(!vocab.valuesIterator.contains(eosId),
      s"vocab must not assign the EOS id $eosId")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(d => graft.extra.Sampling.hashBucketLong(
        d.doc_id, shards).toInt)
      .flatMapGroupsWithState[BinState, SeqRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[PackDoc], state: GroupState[BinState]) =>
          val st = state.getOption.getOrElse(BinState(0L, 0L, 0L, Nil))
          // The open bin accumulates in a PRIMITIVE long buffer and
          // converts to the encoder-facing Seq only at emit/update: the
          // immutable-Seq form of this loop (`st.ids ++ ids` per doc)
          // is O(bin²) boxed-list copying — ~10⁸ List cells per 100k-doc
          // micro-batch, a measured GC collapse to ~2k docs/s.
          var nextSeq = st.nextSeq
          var nDocs = st.nDocs
          var fill = st.fill
          var buf = new Array[Long](
            math.max(16L, math.min(budget + 1L, 1L << 20)).toInt)
          var len = 0
          st.ids.foreach { v =>
            if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
            buf(len) = v; len += 1
          }
          def render(): String = {
            val sb = new java.lang.StringBuilder(len * 6)
            var i = 0
            while (i < len) {
              if (i > 0) sb.append(',')
              sb.append(buf(i)); i += 1
            }
            sb.toString
          }
          val out = Seq.newBuilder[SeqRow]
          // in-batch determinism: apply docs in id order regardless of
          // the micro-batch's physical layout
          val batch = rows.toArray
          scala.util.Sorting.stableSort(batch,
            (x: PackDoc, y: PackDoc) => x.doc_id < y.doc_id)
          batch.foreach { d =>
            val n = if (d.syms == null) 0 else d.syms.size
            val cost = n + 1L
            if (nDocs > 0 && fill + cost > budget) {
              out += SeqRow(shard, nextSeq, nDocs, fill, render())
              nextSeq += 1L; nDocs = 0L; fill = 0L; len = 0
            }
            if (d.syms != null) {
              val it = d.syms.iterator
              while (it.hasNext) {
                if (len == buf.length)
                  buf = java.util.Arrays.copyOf(buf, len * 2)
                buf(len) = vocab.getOrElse(it.next(), oovId); len += 1
              }
            }
            if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
            buf(len) = eosId; len += 1
            nDocs += 1L; fill += cost
          }
          state.update(BinState(nextSeq, nDocs, fill,
            buf.take(len).toIndexedSeq))
          out.result().iterator
      }
  }

  /** Adapt a (doc_id, syms) DataFrame — e.g. a curated stream with
    * `Text.bpeSymbols` applied — to the typed input.
    */
  def fromDocFrame(df: DataFrame, idCol: String = "doc_id",
      symsCol: String = "syms"): Dataset[PackDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
      col(symsCol).as("syms")).as[PackDoc]
  }
}
