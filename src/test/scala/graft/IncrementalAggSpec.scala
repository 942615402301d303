package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.extra.IncrementalAgg
import graft.extra.IncrementalAgg.ViewSpec

/** Incrementally-maintained materialized aggregates: every refresh
  * sequence must land on EXACTLY the state a one-shot build over the
  * union produces (count/sum/min/max exact, HLL estimates identical
  * because sketch union is register-wise max), and refresh must touch
  * only the state files whose grain range the delta hits.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"incragg-$tag").toString

  private val spec = ViewSpec("g",
    sumCols = Seq("amt"), minCols = Seq("amt"), maxCols = Seq("amt"),
    hllCols = Seq("u"))

  /** (g, amt decimal(18,2), u) rows with grain g = id % groups. */
  private def rows(ids: Range, groups: Int): DataFrame =
    ids.map(i => (i.toLong % groups, BigDecimal(i * 7 % 101) / 4,
      s"u${i % 37}"))
      .toDF("g", "amt", "u")
      .select(col("g"), col("amt").cast("decimal(18,2)").as("amt"),
        col("u"))

  private def served(dir: String): Seq[(Long, Long, Double, Double,
      Double, Long)] =
    IncrementalAgg.finalizeView(IncrementalAgg.read(spark, dir), spec)
      .select(col("g"), col("cnt"), col("sum_amt").cast("double"),
        col("min_amt").cast("double"), col("max_amt").cast("double"),
        col("ndv_u"))
      .as[(Long, Long, Double, Double, Double, Long)]
      .collect().sortBy(_._1).toSeq

  test("init + k refreshes == one-shot build over the union " +
      "(count/sum/min/max exact, HLL estimates identical)") {
    val inc = freshDir("inc")
    val full = freshDir("full")
    val all = rows(0 until 900, 12)
    IncrementalAgg.init(rows(0 until 300, 12), spec, inc, numFiles = 4)
    IncrementalAgg.refresh(spark, inc,
      rows(300 until 700, 12), spec)
    IncrementalAgg.refresh(spark, inc,
      rows(700 until 900, 12), spec)
    IncrementalAgg.init(all, spec, full, numFiles = 4)
    assert(served(inc) == served(full))
    // and against a plain aggregate of the raw rows
    val direct = all.groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        sum(col("amt")).cast("double").as("s"),
        min(col("amt")).cast("double").as("mn"),
        max(col("amt")).cast("double").as("mx"))
      .as[(Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(served(inc).map(t => (t._1, t._2, t._3, t._4, t._5)) == direct)
  }

  test("refresh rewrites only the state files whose grain range the " +
      "delta touches; cold files keep path and bytes") {
    val dir = freshDir("prune")
    // grains 0..99, clustered into 8 disjoint-range files
    val base = spark.range(10000)
      .select((col("id") % 100).as("g"),
        col("id").cast("decimal(18,2)").as("amt"),
        concat(lit("u"), col("id") % 13).as("u"))
    IncrementalAgg.init(base, spec, dir, numFiles = 8)
    val before = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
      .map(p => p -> Files.size(java.nio.file.Paths.get(p))).toMap
    assert(before.size == 8)
    // delta hits grains 3..5 only → one or two neighboring files
    val delta = spark.range(50)
      .select((col("id") % 3 + 3).as("g"),
        lit(1).cast("decimal(18,2)").as("amt"), lit("ux").as("u"))
    val stats = IncrementalAgg.refresh(spark, dir, delta, spec)
    assert(stats.filesTotal == 8)
    assert(stats.filesRewritten <= 2, stats.toString)
    val after = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
      .map(p => p -> Files.size(java.nio.file.Paths.get(p))).toMap
    val untouchedBefore = before.filter { case (p, _) =>
      after.contains(p) }
    assert(untouchedBefore.size >= 6)
    untouchedBefore.foreach { case (p, sz) => assert(after(p) == sz) }
  }

  test("never-seen grains are inserted without rewriting any file") {
    val dir = freshDir("insert")
    IncrementalAgg.init(rows(0 until 200, 4), spec, dir, numFiles = 2)
    val delta = Seq((99L, BigDecimal(5), "unew")).toDF("g", "amt", "u")
      .select(col("g"), col("amt").cast("decimal(18,2)").as("amt"),
        col("u"))
    val stats = IncrementalAgg.refresh(spark, dir, delta, spec)
    assert(stats.filesRewritten == 0, stats.toString)
    val got = served(dir)
    assert(got.exists(r => r._1 == 99L && r._2 == 1L && r._3 == 5.0))
    assert(got.size == 5)
  }

  test("sum over floating input is rejected; empty delta is a no-op") {
    val dir = freshDir("guard")
    IncrementalAgg.init(rows(0 until 100, 4), spec, dir, numFiles = 2)
    val bad = Seq((1L, 1.5, "u")).toDF("g", "amt", "u")
    intercept[IllegalArgumentException] {
      IncrementalAgg.partials(bad, ViewSpec("g", sumCols = Seq("amt")))
    }
    val beforeState = served(dir)
    val stats = IncrementalAgg.refresh(spark, dir,
      rows(0 until 0, 4), spec)
    assert(stats.filesRewritten == 0 && stats.rowsWritten == 0L)
    assert(served(dir) == beforeState)
  }

  test("refreshFromSnapshot: a snapshot change feed with inserts, " +
      "deletes, and updates retracts exactly — view == one-shot over " +
      "the new version; emptied grains vanish; min/max specs rejected") {
    import graft.extra.Snapshots
    val subSpec = ViewSpec("g", sumCols = Seq("amt"))
    val snap = freshDir("snapsrc")
    val view = freshDir("snapview")
    // snapshot table keyed by id, grain g = id % 5; grain 4 has
    // exactly two rows (ids 4, 9) so deleting both empties it
    def tbl(ids: Seq[Long]) = ids.toDF("id")
      .select(col("id"), (col("id") % 5).as("g"),
        (col("id") * 7 % 13).cast("decimal(18,2)").as("amt"))
    Snapshots.init(tbl(0L until 10L), snap, "id", numFiles = 2)
    IncrementalAgg.init(
      Snapshots.read(spark, snap, Some(0L)), subSpec, view, 2)

    Snapshots.upsert(spark, snap, Seq((3L, 3L, BigDecimal(99)),
      (20L, 0L, BigDecimal(1))).toDF("id", "g", "amt")
      .select(col("id"), col("g"),
        col("amt").cast("decimal(18,2)").as("amt")), "id")
    Snapshots.delete(spark, snap,
      Seq(4L, 9L).toDF("id"), "id")

    IncrementalAgg.refreshFromSnapshot(spark, view, snap, 0L, 2L,
      "id", subSpec)

    val oneShot = freshDir("snapfull")
    IncrementalAgg.init(
      Snapshots.read(spark, snap, Some(2L)), subSpec, oneShot, 2)
    def state(d: String) = IncrementalAgg.read(spark, d)
      .select(col("g"), col("cnt"), col("sum_amt").cast("double"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(state(view) == state(oneShot))
    // grain 4 (ids 4 and 9 both deleted) is gone, not zero-count
    assert(!state(view).exists(_._1 == 4L))

    intercept[IllegalArgumentException] {
      IncrementalAgg.refreshFromSnapshot(spark, view, snap, 0L, 2L,
        "id", spec) // spec has min/max/hll — not subtractable
    }
  }

  test("refreshVersioned: every refresh commits a snapshot version; " +
      "any version serves exactly its era's one-shot view") {
    import graft.extra.Snapshots
    val dir = freshDir("versioned")
    Snapshots.init(IncrementalAgg.partials(rows(0 until 300, 12), spec),
      dir, "g", numFiles = 4)
    val c1 = IncrementalAgg.refreshVersioned(spark, dir,
      rows(300 until 700, 12), spec)
    val c2 = IncrementalAgg.refreshVersioned(spark, dir,
      rows(700 until 900, 12), spec)
    assert(c1.version == 1L && c2.version == 2L)

    def servedAt(v: Long, era: Range) = {
      val got = IncrementalAgg.finalizeView(
        Snapshots.read(spark, dir, Some(v)), spec)
        .select(col("g"), col("cnt"), col("sum_amt").cast("double"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      val full = freshDir(s"vfull$v")
      IncrementalAgg.init(rows(era, 12), spec, full, 2)
      val want = IncrementalAgg.finalizeView(
        IncrementalAgg.read(spark, full), spec)
        .select(col("g"), col("cnt"), col("sum_amt").cast("double"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      (got, want)
    }
    val (g0, w0) = servedAt(0L, 0 until 300)
    assert(g0 == w0)
    val (g1, w1) = servedAt(1L, 0 until 700)
    assert(g1 == w1)
    val (g2, w2) = servedAt(2L, 0 until 900)
    assert(g2 == w2)
  }

  test("randomized differential: random batch splits land on the " +
      "one-shot state (seeded)") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 3).foreach { trial =>
      val n = 200 + rnd.nextInt(400)
      val groups = 1 + rnd.nextInt(20)
      val cut1 = 10 + rnd.nextInt(n - 10)
      val cut2 = cut1 + rnd.nextInt(n - cut1)
      val inc = freshDir(s"rand$trial")
      val full = freshDir(s"randf$trial")
      IncrementalAgg.init(rows(0 until cut1, groups), spec, inc,
        numFiles = 1 + rnd.nextInt(6))
      IncrementalAgg.refresh(spark, inc,
        rows(cut1 until cut2, groups), spec)
      IncrementalAgg.refresh(spark, inc,
        rows(cut2 until n, groups), spec)
      IncrementalAgg.init(rows(0 until n, groups), spec, full,
        numFiles = 3)
      assert(served(inc) == served(full), s"trial $trial n=$n " +
        s"groups=$groups cuts=($cut1,$cut2)")
    }
  }
}
