package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.extra.Cep

/** Hand-checked CEP pattern-matching semantics (the oracle gate checks
  * matchContiguous at corpus scale; matchSkipTillNext is inherently
  * sequential and pinned here on fixtures small enough to verify by
  * eye).
  */
class CepSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("key", "ms", "id", "typ")
      .select(col("key"), timestamp_millis(col("ms")).as("ts"),
        col("id"), col("typ"))

  test("matchContiguous: strict runs only; overlaps all emit; " +
      "window bound excludes slow runs") {
    val df = ev(
      (1L, 0L, 0L, "a"), (1L, 10L, 1L, "b"), (1L, 20L, 2L, "c"), // match
      (1L, 30L, 3L, "x"),
      (1L, 40L, 4L, "a"), (1L, 50L, 5L, "x"), (1L, 60L, 6L, "b"), // broken
      (2L, 0L, 0L, "a"), (2L, 9000L, 1L, "b"), (2L, 20000L, 2L, "c")) // slow
    val out = Cep.matchContiguous(df, "key", "ts", "typ",
        Seq("a", "b", "c"), withinMs = 10000L, tieCol = "id")
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L)
    assert(out.head.getAs[Long]("duration_ms") == 20L)
    // overlapping occurrences both emit: a b a b with pattern (a b)
    val df2 = ev((1L, 0L, 0L, "a"), (1L, 1L, 1L, "b"),
      (1L, 2L, 2L, "a"), (1L, 3L, 3L, "b"))
    assert(Cep.matchContiguous(df2, "key", "ts", "typ", Seq("a", "b"),
      10000L, "id").count() == 2)
    // a a b: the run must be contiguous — only the second a matches
    val df3 = ev((1L, 0L, 0L, "a"), (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"))
    val m3 = Cep.matchContiguous(df3, "key", "ts", "typ", Seq("a", "b"),
      10000L, "id").collect()
    assert(m3.length == 1 &&
      m3.head.getAs[Timestamp]("match_start").getTime == 1L)
  }

  test("matchSkipTillNext: gaps skipped and counted; greedy " +
      "non-overlapping resume after the match end") {
    // a x b x x c → one match, 3 skipped
    val df = ev((1L, 0L, 0L, "a"), (1L, 1L, 1L, "x"), (1L, 2L, 2L, "b"),
      (1L, 3L, 3L, "x"), (1L, 4L, 4L, "x"), (1L, 5L, 5L, "c"))
    val out = Cep.matchSkipTillNext(df, "key", "ts", "typ",
      Seq("a", "b", "c"), 10000L, "id").collect()
    assert(out.length == 1)
    assert(out.head.n_skipped == 3)
    assert(out.head.duration_ms == 5L)
    // a b a c b c: greedy binds the FIRST a, skips the second, closes at
    // the first c; the remainder (b c) holds no further a → 1 match
    val df2 = ev((1L, 0L, 0L, "a"), (1L, 1L, 1L, "b"), (1L, 2L, 2L, "a"),
      (1L, 3L, 3L, "c"), (1L, 4L, 4L, "b"), (1L, 5L, 5L, "c"))
    val out2 = Cep.matchSkipTillNext(df2, "key", "ts", "typ",
      Seq("a", "b", "c"), 10000L, "id").collect()
    assert(out2.length == 1)
    assert(out2.head.match_end.getTime == 3L && out2.head.n_skipped == 1)
  }

  test("matchSkipTillNext: a start that cannot complete in the window " +
      "is abandoned and does not shadow a later viable start") {
    val df = ev(
      (1L, 0L, 0L, "a"),          // b arrives too late for this start
      (1L, 6000L, 1L, "a"), (1L, 6001L, 2L, "b"), (1L, 6002L, 3L, "c"))
    val out = Cep.matchSkipTillNext(df, "key", "ts", "typ",
      Seq("a", "b", "c"), 5000L, "id").collect()
    assert(out.length == 1)
    assert(out.head.match_start.getTime == 6000L)
  }

  test("matchSkipTillNext is invariant to input partitioning and " +
      "independent across keys") {
    val rows = (0 until 200).flatMap { i =>
      val key = (i % 7).toLong
      val typ = Seq("a", "x", "b", "y", "c")(i % 5)
      Seq((key, i.toLong * 100, i.toLong, typ))
    }
    val df = ev(rows: _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      Cep.matchSkipTillNext(d, "key", "ts", "typ", Seq("a", "b", "c"),
        1000000L, "id").collect()
        .map(m => (m.key, m.match_start.getTime, m.match_end.getTime,
          m.n_skipped)).toSet
    val once = run(df)
    assert(once.nonEmpty)
    assert(run(df.repartition(13)) == once)
  }
}
