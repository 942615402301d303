package graft

import org.apache.spark.sql.functions._

import graft.extra.Quality

/** Hand-checked snapshot-diff and data-quality-check behavior. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed and drops " +
      "unchanged keys") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val nw = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("id", "text")
    val out = Quality.snapshotDiff(old, nw, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff is null-safe in the payload hash") {
    val old = Seq((1L, Option("x")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val nw = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "text")
    val out = Quality.snapshotDiff(old, nw, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 changed (x -> null); 2 unchanged (null == null)
    assert(out == Map(1L -> "changed"))
  }

  test("checkAll reports per-check violation counts, zero included") {
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq((1L, 10L, 5.0), (2L, 10L, -1.0), (3L, 99L, 2.0),
      (3L, 20L, 1.0)).toDF("id", "fk", "qty")
    val report = Quality.checkAll(
      Quality.rowChecks(child, Seq(
        "nonpositive_qty" -> (col("qty") <= 0),
        "null_fk" -> col("fk").isNull)) ++
      Seq(
        Quality.duplicateKeys(child, Seq("id"), "dup_id"),
        Quality.orphans(child, "fk", parent, "pk", "orphan_fk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report == Map(
      "nonpositive_qty" -> 1L, "null_fk" -> 0L,
      "dup_id" -> 1L, "orphan_fk" -> 1L))
  }

  test("rowChecks on an EMPTY frame reports 0 violations, not NULL") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "qty")
    val report = Quality.checkAll(
      Quality.rowChecks(empty, Seq(
        "nonpositive_qty" -> (col("qty") <= 0))) :+
      Quality.duplicateKeys(empty, Seq("id"), "dup_id"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(report == Map("nonpositive_qty" -> 0L, "dup_id" -> 0L))
  }
}
