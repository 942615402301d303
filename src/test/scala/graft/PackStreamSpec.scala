package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.extra.{Packing, Sampling}
import graft.streaming.PackStream
import graft.streaming.PackStream.PackDoc

/** Streaming sequence packing: open-bin state across micro-batches,
  * single-batch equality with the batch packer, OOV/EOS framing.
  */
class PackStreamSpec extends SparkSpec {
  import spark.implicits._

  private def vocabOf(docs: Seq[(Long, Seq[String])]): Map[String, Long] =
    docs.flatMap(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap

  private def drive(name: String, docs: Seq[Seq[(Long, Seq[String])]],
      vocab: Map[String, Long], budget: Long, shards: Int) = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PackDoc]
    val q = PackStream.packStream(in.toDS(), vocab, budget, shards)
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    docs.foreach { batch =>
      in.addData(batch.map { case (id, syms) => PackDoc(id, syms) })
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("hashBucketLong is bit-identical to the hashBucket column form") {
    val ids = (-3L to 200L) ++ Seq(Long.MaxValue, Long.MinValue + 1)
    val viaCol = ids.toDF("id")
      .select(col("id"), Sampling.hashBucket(col("id"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(Sampling.hashBucketLong(id, 8) == viaCol(id), s"id=$id")
    }
  }

  test("single-batch drive equals the batch packer's CLOSED bins " +
      "(the per-shard tail stays open in state)") {
    val docs = (1L to 120L).map { i =>
      i -> (0L until (i * 5) % 9).map(j => s"w${(i + j) % 11}")
    }
    val vocab = vocabOf(docs)
    val streamed = drive("ps_single", Seq(docs), vocab, budget = 24,
      shards = 4)
    val batch = Packing.packExamples(docs.toDF("doc_id", "syms"),
        "doc_id", col("syms"), budget = 24, shards = 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    // batch emits every bin; the stream withholds each shard's last
    // (still-open) bin
    val tails = batch.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
    val closed = batch.filterNot(tails.toSet)
    assert(streamed == closed.sortBy(t => (t._1, t._2)))
    assert(streamed.nonEmpty)
  }

  test("open bin carries across micro-batches; an oversize doc closes " +
      "and then occupies its own bin") {
    // shards=1: one packing lane. vocab a=1 b=2
    val vocab = Map("a" -> 1L, "b" -> 2L)
    val b1 = Seq(1L -> Seq("a", "a"), 2L -> Seq("b"))     // fill 3+2=5
    val b2 = Seq(3L -> Seq("b", "b", "b"))                // 4 → close@5, open 4
    val b3 = Seq(4L -> (0 until 9).map(_ => "a"))         // 10 > 8: close@4, open 10
    val out = drive("ps_state", Seq(b1, b2, b3), vocab, budget = 8,
      shards = 1)
    assert(out == Seq(
      (0, 0L, 2L, 5L, "1,1,0,2,0"),
      (0, 1L, 1L, 4L, "2,2,2,0")))
    // the oversize doc's own bin is the open tail — not yet emitted
  }

  test("docs are applied in id order inside a batch regardless of " +
      "arrival layout; OOV symbols map to oovId, never to EOS") {
    val vocab = Map("x" -> 1L)
    // arrival order reversed vs ids
    val batch = Seq(2L -> Seq("mystery"), 1L -> Seq("x"))
    val out = drive("ps_order", Seq(batch), vocab, budget = 4, shards = 1)
    // id order: doc1 (2) then doc2 (2) → fill 4 = budget, still open?
    // 2 + 2 = 4 ≤ 4: both in bin 0, open. Nothing closed yet — so use
    // a closer doc to flush.
    assert(out.isEmpty)
    val out2 = drive("ps_order2",
      Seq(batch, Seq(3L -> Seq("x", "x", "x"))), vocab, budget = 4,
      shards = 1)
    assert(out2 == Seq((0, 0L, 2L, 4L, "1,0,-1,0")))
  }

  test("guards: vocab must not claim the EOS id; eos and oov differ") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PackDoc]
    val e = intercept[IllegalArgumentException](
      PackStream.packStream(in.toDS(), Map("a" -> 0L), 8, 1))
    assert(e.getMessage.contains("EOS"))
    val e2 = intercept[IllegalArgumentException](
      PackStream.packStream(in.toDS(), Map("a" -> 1L), 8, 1,
        eosId = 5L, oovId = 5L))
    assert(e2.getMessage.contains("differ"))
  }
}
