package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extra.Dedup
import graft.model.Tables

/** Deduplication queries (north-star X1/X2 + the training-data dedup
  * family): exact hash dedup, keyed latest-wins, MinHash+LSH, exact
  * n-gram Jaccard, SimHash, embedding-cosine near-dup.
  */
object DedupQueriesImpl {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  private val shinglesSql =
    """list_distinct(CASE WHEN len(toks) >= 3 THEN
      |    list_transform(range(1, len(toks) - 1),
      |      i -> array_to_string(toks[i:i+2], ' '))
      |    ELSE [] END)""".stripMargin
  private val toksCte =
    """t AS (SELECT doc_id,
      |  list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  /** Candidate-pair CTEs over a `bands` CTE, modeling the engine's
    * hot-bucket cap ([[Dedup.DefaultMaxBucket]]): buckets wider than the
    * cap contribute no candidates, in the oracle exactly as in
    * [[Dedup.lshCandidates]] — so oracle parity no longer depends on the
    * test corpus never producing an over-cap bucket.
    */
  private val candCappedCtes =
    s"""okb AS (SELECT band, sig FROM bands
       |        GROUP BY band, sig HAVING count(*) <= ${Dedup.DefaultMaxBucket}),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM okb o
       |         JOIN bands a ON a.band = o.band AND a.sig = o.sig
       |         JOIN bands b ON b.band = o.band AND b.sig = o.sig
       |          AND a.doc_id < b.doc_id)""".stripMargin

  // ---- dedup_exact --------------------------------------------------

  /** Exact dedup by content hash over documents (hash-groupBy). */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactByKey(
      docs(s, dir).withColumn("text_hash", md5(col("text"))),
      Seq("text_hash"), "doc_id")
      .orderBy("text_hash")

  private val dedupExactOracle =
    """SELECT md5(text) AS text_hash, min(doc_id) AS first_doc_id,
      |       count(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---- dedup_latest -------------------------------------------------

  /** Keyed latest-wins over events: newest row per (user_id, event_type).
    * The finalization operator for update-mode append+last-wins sinks
    * (SURVEY.md §2.4 ST6).
    */
  def dedupLatest(s: SparkSession, dir: String): DataFrame =
    Dedup.latestWins(events(s, dir), Seq("user_id", "event_type"),
      "ts", "event_id")
      .orderBy("user_id", "event_type")

  private val dedupLatestOracle =
    """SELECT event_id, ts, user_id, event_type, value, props
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
      |  ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id, event_type""".stripMargin

  // ---- snapshot_timetravel -----------------------------------------

  /** Snapshot-versioned last-wins table with TIME TRAVEL
    * ([[graft.extra.Snapshots]]): version 0 is the per-user latest
    * event BEFORE the cutoff, version 1 upserts the per-user latest of
    * the rest — cold data files carried by reference, only
    * footer-touched files rewritten, and BOTH versions re-read exactly
    * from their manifests. The query serves v0 and v1 side by side
    * (tagged `version`), which the oracle reproduces as two last-wins
    * window queries over the raw events — the history a mutable table
    * cannot answer and a manifest chain can.
    */
  /** Build-if-absent two-version snapshot table over events (shared by
    * `snapshot_timetravel` and `version_diff`).
    */
  private def snapTable(s: SparkSession, dir: String): String = {
    import graft.extra.Snapshots
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val ev = events(s, dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
    val fp = IndexedCorpus.fingerprint(ev, col("user_id"),
      col("event_id"), col("ts"))
    // Ver.snap bumps whenever the snapshot layout the query builders
    // write changes (e.g. the #ts commit-stamp header the s1→s2 bump
    // covered) — old cached tables become structurally unreachable.
    IndexedCorpus.cachedDir("graft_qsnap", IndexedCorpus.Ver.snap, fp) { d =>
      val v0 = Dedup.latestWins(ev.filter(col("ts") < cutoff),
        Seq("user_id"), "ts", "event_id")
      val updates = Dedup.latestWins(ev.filter(col("ts") >= cutoff),
        Seq("user_id"), "ts", "event_id")
      Snapshots.init(v0, d.toString, "user_id", numFiles = 4,
        statsCols = Seq("ts"))
      Snapshots.upsert(s, d.toString, updates, "user_id"): Unit
    }
  }

  def snapshotTimetravel(s: SparkSession, dir: String): DataFrame = {
    import graft.extra.Snapshots
    val table = snapTable(s, dir)
    val v0 = Snapshots.read(s, table, Some(0L))
      .withColumn("version", lit(0))
    val v1 = Snapshots.read(s, table, Some(1L))
      .withColumn("version", lit(1))
    v0.unionByName(v1)
      .select(col("version"), col("user_id"), col("event_id"),
        col("ts"), col("event_type"), col("value"))
      .orderBy("version", "user_id")
  }

  private val snapshotTimetravelOracle =
    """WITH v0 AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM events
      |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1),
      |v1 AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM events
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1)
      |SELECT 0 AS version, * FROM v0
      |UNION ALL
      |SELECT 1 AS version, * FROM v1
      |ORDER BY version, user_id""".stripMargin

  // ---- point_lookup ------------------------------------------------

  /** Serving-read shape ([[graft.extra.Snapshots.lookup]]): five user
    * keys against the snapshot table open ONLY the data files whose
    * key range may hold them — planned from the MANIFEST's recorded
    * per-file ranges ([[graft.extra.Snapshots.fileRanges]]), so the
    * prune is O(one manifest read) with zero footer opens; on a
    * 10⁵-file table that is the difference between one metadata read
    * and 10⁵ object-store round trips. The oracle recomputes the
    * latest version from raw events and filters, i.e. the table-scan
    * cost the pruning avoids.
    */
  def pointLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keys = Seq(3L, 31L, 59L, 97L, 131L).toDF("user_id")
    graft.extra.Snapshots.lookup(s, snapTable(s, dir), keys, "user_id")
      .orderBy("user_id")
  }

  private val pointLookupOracle =
    """SELECT user_id, event_id, ts, event_type, value FROM events
      |WHERE user_id IN (3, 31, 59, 97, 131)
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  // ---- snapshot_range_read -----------------------------------------

  /** Time-window read over the snapshot table via its manifest-recorded
    * SECONDARY-column stats ([[graft.extra.Snapshots.readRange]]): the
    * table is clustered by `user_id`, but every commit also records
    * each file's (min, max) on `ts` (`statsCols`), so a "which rows
    * changed in this window" read skips files whose recorded ts range
    * misses the window — zero footer opens, one manifest read, exact
    * predicate applied on top. The oracle recomputes latest-wins from
    * raw events and filters — the table-scan cost the stats avoid.
    * Session tz is pinned UTC, so the UTC instants below equal the
    * oracle's naive literals.
    */
  def snapshotRangeRead(s: SparkSession, dir: String): DataFrame =
    graft.extra.Snapshots.readRange(s, snapTable(s, dir), "ts",
      java.time.Instant.parse("2024-01-28T00:00:00Z"),
      java.time.Instant.parse("2024-01-30T00:00:00Z"))
      .orderBy("user_id")

  private val snapshotRangeReadOracle =
    """SELECT user_id, event_id, ts, event_type, value FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY ts DESC, event_id DESC) = 1
      |  AND ts >= TIMESTAMP '2024-01-28 00:00:00'
      |  AND ts <= TIMESTAMP '2024-01-30 00:00:00'
      |ORDER BY user_id""".stripMargin

  // ---- snapshot_zorder_read ----------------------------------------

  /** The SAME time-window read as `snapshot_range_read`, served from a
    * Z-ORDERED snapshot ([[graft.extra.Snapshots.init]]'s `zorderCols`
    * → [[graft.extra.Layout.writeZOrdered]]'s Morton curve, persisted
    * as `#zorder=`): every file is narrow on BOTH user_id and ts at
    * once, so the window prune works through the same manifest stats
    * without relying on commit-order correlation — the multi-dim
    * clustering answer where 1-D key files would each span the full
    * ts width. Both queries hash-match the same oracle, pinning that
    * the layout strategy changes file-skipping, never rows.
    */
  private def zSnapTable(s: SparkSession, dir: String): String = {
    import graft.extra.Snapshots
    val ev = events(s, dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
    val fp = IndexedCorpus.fingerprint(ev, col("user_id"),
      col("event_id"), col("ts"))
    IndexedCorpus.cachedDir("graft_qzsnap", IndexedCorpus.Ver.zsnap,
        fp) { d =>
      val latest = Dedup.latestWins(ev, Seq("user_id"), "ts", "event_id")
      Snapshots.init(latest, d.toString, "user_id", numFiles = 8,
        zorderCols = Seq("user_id", "ts")): Unit
    }
  }

  def snapshotZorderRead(s: SparkSession, dir: String): DataFrame =
    graft.extra.Snapshots.readRange(s, zSnapTable(s, dir), "ts",
      java.time.Instant.parse("2024-01-28T00:00:00Z"),
      java.time.Instant.parse("2024-01-30T00:00:00Z"))
      .orderBy("user_id")

  // ---- snapshot_sql_tvf --------------------------------------------

  /** The SQL surface of time travel: the same snapshot table served
    * through the `graft_snapshot('dir', version)` TABLE-VALUED
    * FUNCTION ([[graft.GraftExtensions]], `injectTableFunction`) — a
    * SQL user reads any committed version with a plain SELECT, planned
    * through the identical manifest path as
    * [[graft.extra.Snapshots.read]]. The oracle recomputes v1
    * (latest-wins over all events) from the raw table.
    */
  def snapshotSqlTvf(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.registerAll(s)
    val table = snapTable(s, dir)
    s.sql(s"SELECT user_id, event_id, ts, event_type, value " +
      s"FROM graft_snapshot('$table', 1) ORDER BY user_id")
  }

  private val snapshotSqlTvfOracle =
    """SELECT user_id, event_id, ts, event_type, value FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  // ---- snapshot_ts_travel ------------------------------------------

  /** `TIMESTAMP AS OF` time travel over the same snapshot table: v0
    * resolved through the SCALA surface
    * ([[graft.extra.Snapshots.readAsOfTime]]) at one millisecond
    * before v1's commit stamp (proving the "latest version ≤ t"
    * boundary), v1 through the SQL surface — a `TIMESTAMP` literal in
    * the `graft_snapshot` TVF. Commit stamps are wall-clock (monotonic
    * per table), so the query derives its probe instants from the
    * table's OWN recorded stamps ([[graft.extra.Snapshots.commitTime]])
    * — the resolved versions, and therefore the rows, are
    * deterministic regardless of when the table was built. Output is
    * identical to `snapshot_timetravel`, pinning ts-resolution ==
    * version-resolution against the same oracle.
    */
  def snapshotTsTravel(s: SparkSession, dir: String): DataFrame = {
    import graft.extra.Snapshots
    graft.GraftExtensions.registerAll(s)
    val table = snapTable(s, dir)
    val t1 = Snapshots.commitTime(s, table, 1L).getOrElse(
      throw new IllegalStateException(s"$table v1 carries no #ts stamp"))
    val v0 = Snapshots.readAsOfTime(s, table,
        java.time.Instant.ofEpochMilli(t1 - 1))
      .withColumn("version", lit(0))
    val lit1 = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(t1))
    val v1 = s.sql(
      s"SELECT * FROM graft_snapshot('$table', " +
        s"TIMESTAMP '$lit1+00:00')")
      .withColumn("version", lit(1))
    v0.unionByName(v1)
      .select(col("version"), col("user_id"), col("event_id"),
        col("ts"), col("event_type"), col("value"))
      .orderBy("version", "user_id")
  }

  // ---- snapshot_restore --------------------------------------------

  /** RESTORE as an append-only rollback ([[graft.extra.Snapshots
    * .restore]] — the Delta `RESTORE TABLE ... TO VERSION AS OF`
    * shape): its own three-version table (init v0, upsert v1,
    * restore-to-0 v2 — built once, content-keyed + version-token
    * cached, so the chain is fixed across runs). The query serves the
    * PRE-rollback head (v1, still time-travelable — history is
    * append-only) next to the post-rollback head (latest = v2, whose
    * content must equal v0), tagged by version. The restore commit
    * itself moved NO data: v2 re-references v0's files by name.
    * Oracle: the same two last-wins window queries over raw events,
    * with the head tag proving the rollback landed.
    */
  private def snapRestoreTable(s: SparkSession, dir: String): String = {
    import graft.extra.Snapshots
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val ev = events(s, dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
    val fp = IndexedCorpus.fingerprint(ev, col("user_id"),
      col("event_id"), col("ts"))
    IndexedCorpus.cachedDir("graft_qsnapr", IndexedCorpus.Ver.snapRestore,
        fp) { d =>
      val v0 = Dedup.latestWins(ev.filter(col("ts") < cutoff),
        Seq("user_id"), "ts", "event_id")
      val updates = Dedup.latestWins(ev.filter(col("ts") >= cutoff),
        Seq("user_id"), "ts", "event_id")
      Snapshots.init(v0, d.toString, "user_id", numFiles = 4,
        statsCols = Seq("ts"))
      Snapshots.upsert(s, d.toString, updates, "user_id"): Unit
      Snapshots.restore(s, d.toString, 0L): Unit
    }
  }

  def snapshotRestore(s: SparkSession, dir: String): DataFrame = {
    import graft.extra.Snapshots
    val table = snapRestoreTable(s, dir)
    val v1 = Snapshots.read(s, table, Some(1L))
      .withColumn("version", lit(1))
    val head = Snapshots.read(s, table) // latest == the v2 rollback
      .withColumn("version", lit(2))
    v1.unionByName(head)
      .select(col("version"), col("user_id"), col("event_id"),
        col("ts"), col("event_type"), col("value"))
      .orderBy("version", "user_id")
  }

  private val snapshotRestoreOracle =
    """WITH v0 AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM events
      |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1),
      |v1 AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM events
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1)
      |SELECT 1 AS version, * FROM v1
      |UNION ALL
      |SELECT 2 AS version, * FROM v0
      |ORDER BY version, user_id""".stripMargin

  // ---- cdc_view_stream ---------------------------------------------

  /** Streamed CDC history maintaining an incremental view END TO END —
    * the two halves composed: [[graft.streaming.SnapshotStream]]'s
    * batch apply commits three exactly-once CDC versions onto a
    * last-wins snapshot table (key `user_id`, version `ver` =
    * event-time micros ⊕ event id, so "latest" is total and matches
    * the oracle's `ts DESC, event_id DESC`), and after each commit
    * [[graft.extra.IncrementalAgg.refreshFromSnapshot]] consumes
    * exactly that version-pair's change feed — retracting updated
    * users' old contributions, adding new ones — into a per-event-type
    * count/sum view. The served view hash-matches the oracle's
    * ONE-SHOT aggregate over the final latest-wins state: streamed
    * maintenance == recompute, which is the correctness bar for
    * maintaining a dashboard off a mutating 100 TB table without
    * rescanning either side.
    */
  def cdcViewStream(s: SparkSession, dir: String): DataFrame = {
    import graft.extra.{IncrementalAgg, Snapshots}
    import graft.streaming.SnapshotStream
    val rows = events(s, dir).select(
      col("user_id"),
      col("event_type"),
      col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))
        .as("value"),
      (unix_micros(col("ts"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * lit(1000000000L) + col("event_id")).as("ver"),
      col("ts"))
    val spec = IncrementalAgg.ViewSpec("event_type",
      sumCols = Seq("value"))
    val fp = IndexedCorpus.fingerprint(rows, col("user_id"), col("ver"))
    val viewDir = IndexedCorpus.cachedDir("graft_qcdcview",
        IndexedCorpus.Ver.cdcview, fp) { d =>
      val tbl = new java.io.File(d, "tbl").toString
      val view = new java.io.File(d, "view").toString
      def slice(lo: String, hi: String) = rows
        .filter(col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp"))
        .select("user_id", "event_type", "value", "ver")
      val v0 = graft.extra.Dedup.latestWins(
        slice("2024-01-01", "2024-01-10"), Seq("user_id"), "ver", "ver")
        .select("user_id", "event_type", "value", "ver")
      Snapshots.init(v0, tbl, "user_id", numFiles = 4)
      IncrementalAgg.init(Snapshots.read(s, tbl, Some(0L)), spec, view,
        numFiles = 2)
      // three CDC batches through the streaming sink's exact apply
      // path (txn-ledgered, last-wins-reduced, version-guarded), each
      // followed by the view consuming that version-pair's diff
      Seq(("2024-01-10", "2024-01-16"), ("2024-01-16", "2024-01-23"),
        ("2024-01-23", "2024-02-01")).zipWithIndex.foreach {
          case ((lo, hi), i) =>
            val applied = SnapshotStream.applyBatch(slice(lo, hi), tbl,
              "user_id", "ver", appId = "cdc_view_stream", batchId = i)
            require(applied, s"CDC batch $i was unexpectedly skipped")
            IncrementalAgg.refreshFromSnapshot(s, view, tbl, i, i + 1L,
              "user_id", spec): Unit
          }
    }
    // Serving projection casts the DECIMAL(38,6) running sum to DOUBLE
    // (rounded 6dp), the registry-wide oracle convention: the view's
    // internal state stays decimal-exact, only the served frame is
    // canonicalized so the driver hash and DuckDB agree byte-for-byte.
    IncrementalAgg.read(s, new java.io.File(viewDir, "view").toString)
      .select(col("event_type"), col("cnt"),
        round(col("sum_value").cast("double"), 6).as("sum_value"))
      .orderBy("event_type")
  }

  private val cdcViewStreamOracle =
    """WITH latest AS (
      |  SELECT user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value
      |  FROM events
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1)
      |SELECT event_type, count(*) AS cnt,
      |  round(CAST(sum(value) AS DOUBLE), 6) AS sum_value
      |FROM latest
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---- version_diff ------------------------------------------------

  /** CDC extract between two snapshot versions
    * ([[graft.extra.Snapshots.diff]]): reads ONLY the data files the
    * manifests do not share (immutable shared files cannot hold a
    * change — diff cost is O(files replaced), not O(table)), then
    * classifies keys in the non-shared files as inserted / deleted /
    * updated, dropping rewritten-but-identical survivor rows by
    * payload hash. The oracle recomputes both versions from raw
    * events and full-outer-joins them — same answer, table-sized
    * cost: exactly the work the manifest structure avoids.
    */
  def versionDiff(s: SparkSession, dir: String): DataFrame =
    graft.extra.Snapshots.diff(s, snapTable(s, dir), 0L, 1L, "user_id")
      .orderBy("user_id")

  private val versionDiffOracle =
    """WITH v0 AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM events
      |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1),
      |v1 AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM events
      |  QUALIFY row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) = 1),
      |j AS (
      |  SELECT CASE WHEN v0.user_id IS NULL THEN 'inserted'
      |              WHEN v1.user_id IS NULL THEN 'deleted'
      |              WHEN v0.event_id <> v1.event_id THEN 'updated'
      |         END AS change,
      |         CASE WHEN v1.user_id IS NULL THEN v0.user_id
      |              ELSE v1.user_id END AS user_id,
      |         CASE WHEN v1.user_id IS NULL THEN v0.event_id
      |              ELSE v1.event_id END AS event_id,
      |         CASE WHEN v1.user_id IS NULL THEN v0.ts
      |              ELSE v1.ts END AS ts,
      |         CASE WHEN v1.user_id IS NULL THEN v0.event_type
      |              ELSE v1.event_type END AS event_type,
      |         CASE WHEN v1.user_id IS NULL THEN v0.value
      |              ELSE v1.value END AS value
      |  FROM v1 FULL OUTER JOIN v0 ON v1.user_id = v0.user_id
      |)
      |SELECT * FROM j WHERE change IS NOT NULL
      |ORDER BY user_id""".stripMargin

  // ---- neardup_minhash ---------------------------------------------

  def neardupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupMinhash(docs(s, dir), "doc_id", "text",
      numPerms = 16, rowsPerBand = 4, shingleN = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** Shared CTE pipeline: tokens → shingles → minhash(16) → bands(4) →
    * capped candidates → verified pairs `j(id_a, id_b, inter, uni)` —
    * the DuckDB replay of [[Dedup.nearDupMinhash]]'s candidate+verify
    * stages, reused by the pairwise and incremental oracles.
    */
  private val minhashPairCtes = {
    import graft.extra.Dedup.{minhashA, minhashB, MinhashP}
    val mins = (0 until 16)
      .map(i => s"  min((h * ${minhashA(i)} + ${minhashB(i)}) % $MinhashP) AS mh$i")
      .mkString(",\n")
    val bandSelects = (0 until 4).map { b =>
      val sig = (0 until 4).map(j => s"CAST(mh${b * 4 + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"  SELECT doc_id, $b AS band, $sig AS sig FROM mh"
    }.mkString("\n  UNION ALL\n")
    s"""$toksCte,
       |ss AS (SELECT doc_id, $shinglesSql AS shingles FROM t),
       |sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM ss),
       |hs AS (SELECT doc_id,
       |         CAST('0x' || substr(md5(shingle), 1, 12) AS BIGINT) AS h
       |       FROM sh),
       |mh AS (SELECT doc_id,
       |$mins
       |FROM hs GROUP BY doc_id),
       |bands AS (
       |$bandSelects),
       |$candCappedCtes,
       |j AS (SELECT c.id_a, c.id_b,
       |        len(list_intersect(x.shingles, y.shingles)) AS inter,
       |        len(x.shingles) + len(y.shingles)
       |          - len(list_intersect(x.shingles, y.shingles)) AS uni
       |      FROM cand c
       |      JOIN ss x ON x.doc_id = c.id_a
       |      JOIN ss y ON y.doc_id = c.id_b)""".stripMargin
  }

  private val neardupMinhashOracle =
    s"""WITH $minhashPairCtes
       |SELECT id_a, id_b, round(CAST(inter AS DOUBLE)/uni, 6) AS jaccard
       |FROM j
       |WHERE CAST(inter AS DOUBLE)/uni >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  // ---- ngram_jaccard ------------------------------------------------

  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(s, dir), "doc_id", "text",
      shingleN = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  private val ngramJaccardOracle =
    s"""WITH $toksCte,
       |ss AS (SELECT doc_id, $shinglesSql AS shingles FROM t),
       |inv AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle
       |        FROM ss),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |        a.n AS n_a, b.n AS n_b, count(*) AS inter
       |      FROM inv a JOIN inv b
       |        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2, 3, 4)
       |SELECT id_a, id_b,
       |  round(CAST(inter AS DOUBLE)/(n_a + n_b - inter), 6) AS jaccard
       |FROM p
       |WHERE CAST(inter AS DOUBLE)/(n_a + n_b - inter) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  // ---- simhash ------------------------------------------------------

  def simhashDocs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  private val simhashOracle = {
    val bits = Dedup.SimhashBits
    val bitSums = (0 until bits)
      .map(j => s"  sum(((h >> $j) & 1) * 2 - 1) AS b$j").mkString(",\n")
    val sig = (0 until bits)
      .map(j => s"CASE WHEN b$j >= 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH $toksCte,
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |h AS (SELECT doc_id,
       |        list_reduce(list_transform(string_split(tok, ''),
       |          c -> ascii(c)), (a, b) -> (a * 31 + b) % 1048576) AS h
       |      FROM tok),
       |bits AS (SELECT doc_id,
       |$bitSums
       |FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($sig AS BIGINT) AS simhash
       |FROM bits
       |ORDER BY doc_id""".stripMargin
  }

  // ---- neardup_embedding -------------------------------------------

  /** LSH-bucketed candidates (4 tables × 4-bit sign-projection buckets,
    * ANY-table collision) + exact cosine verify — the plan that survives
    * a large corpus (every join keyed; no all-pairs). The quadratic
    * all-pairs baseline stays spec-only (DedupSpec recall check).
    */
  def neardupEmbedding(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupLsh(embeddings(s, dir), "vec_id", "embedding",
      threshold = 0.4, tables = 4, bits = 4)
      .orderBy("vec_a", "vec_b")

  private val neardupEmbeddingOracle = {
    // identical integer-lattice hyperplanes as Similarity.lshBucketFor:
    // plane q component i = (i*31 + q*17) mod 7 - 3, q = tbl*bits + p
    def bucketSql(tbl: Int, bits: Int): String =
      (0 until bits).map { p =>
        val q = tbl * bits + p
        s"""CASE WHEN list_sum(list_transform(range(0, len(embedding)),
           |      i -> CAST(embedding[i+1] AS DOUBLE)
           |           * CAST((i*31 + $q*17) % 7 - 3 AS DOUBLE))) >= 0
           |    THEN ${1L << p} ELSE 0 END""".stripMargin
      }.mkString(" + ")
    val buckets = (0 until 4)
      .map(l => s"    ${bucketSql(l, 4)} AS b$l").mkString(",\n")
    val anyMatch = (0 until 4).map(l => s"a.b$l = b.b$l").mkString(" OR ")
    s"""WITH e AS (SELECT vec_id, embedding,
       |  list_sum(list_transform(range(0, len(embedding)),
       |    i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))
       |    AS nrm,
       |$buckets
       |  FROM embeddings),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM e a JOIN e b
       |           ON a.vec_id < b.vec_id AND ($anyMatch)),
       |p AS (SELECT c.vec_a, c.vec_b,
       |  list_sum(list_transform(range(0, len(x.embedding)),
       |    i -> CAST(x.embedding[i+1] AS DOUBLE) * CAST(y.embedding[i+1] AS DOUBLE)))
       |    / (sqrt(x.nrm) * sqrt(y.nrm)) AS cosine
       |  FROM cand c
       |  JOIN e x ON x.vec_id = c.vec_a
       |  JOIN e y ON y.vec_id = c.vec_b)
       |SELECT vec_a, vec_b, round(cosine, 6) AS cosine
       |FROM p
       |WHERE cosine >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // ---- semdedup ------------------------------------------------------

  /** SemDeDup: coarse-quantizer clusters (32 deterministic sample
    * centroids — the IVF codebook), within-cluster cosine ≥ 0.4 → keep
    * the min-id representative. The oracle rebuilds the identical
    * codebook + assignment (same CTE pattern as `sim_topk_ivf`) and
    * replays the pairwise drop with an anti-join.
    */
  def semdedupVectors(s: SparkSession, dir: String): DataFrame =
    Dedup.semDedup(embeddings(s, dir), "vec_id", "embedding",
      threshold = 0.4, numClusters = 32)
      .select(col("id").as("vec_id"), col("cluster_id"))
      .orderBy("vec_id")

  private val semdedupOracle = {
    val norm =
      """list_sum(list_transform(range(0, len(embedding)),
        |    i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))""".stripMargin
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(0, len($a.embedding)),
         |    i -> CAST($a.embedding[i+1] AS DOUBLE) * CAST($b.embedding[i+1] AS DOUBLE)))""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding, $norm AS nrm FROM embeddings),
       |c AS (SELECT vec_id AS cid, embedding, nrm AS cn FROM e
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
       |asgr AS (
       |  SELECT v.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      round(${dot("v", "c")} / (sqrt(v.nrm) * sqrt(c.cn)), 6) DESC,
       |      c.cid) AS crk
       |  FROM e v CROSS JOIN c),
       |asg AS (SELECT vec_id, cid AS cluster_id FROM asgr WHERE crk = 1),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM asg a
       |  JOIN asg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
       |  JOIN e x ON x.vec_id = a.vec_id
       |  JOIN e y ON y.vec_id = b.vec_id
       |  WHERE round(${dot("x", "y")} / (sqrt(x.nrm) * sqrt(y.nrm)), 6)
       |        >= 0.4)
       |SELECT g.vec_id, g.cluster_id
       |FROM asg g
       |WHERE g.vec_id NOT IN (SELECT vec_id FROM dropped)
       |ORDER BY g.vec_id""".stripMargin
  }

  // ---- cluster_sample -------------------------------------------------

  /** Cluster-stratified (diversity-balanced) sampling: 32 deterministic
    * sample-codebook clusters, top-8 per cluster in content-hash order
    * ([[graft.extra.Sampling.clusterStratifiedSample]]) — SemDeDup's
    * cousin with the opposite goal: every semantic region contributes a
    * bounded, reproducible slice to the training cut. The oracle
    * rebuilds the identical codebook + assignment (the semdedup CTEs)
    * and replays the per-cluster hash-order rank.
    */
  def clusterSample(s: SparkSession, dir: String): DataFrame =
    graft.extra.Sampling.clusterStratifiedSample(embeddings(s, dir),
        "vec_id", "embedding", numClusters = 32, perCluster = 8)
      .orderBy("cluster_id", "sample_rank")

  private val clusterSampleOracle = {
    val norm =
      """list_sum(list_transform(range(0, len(embedding)),
        |    i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))""".stripMargin
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(0, len($a.embedding)),
         |    i -> CAST($a.embedding[i+1] AS DOUBLE) * CAST($b.embedding[i+1] AS DOUBLE)))""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding, $norm AS nrm FROM embeddings),
       |c AS (SELECT vec_id AS cid, embedding, nrm AS cn FROM e
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
       |asgr AS (
       |  SELECT v.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      round(${dot("v", "c")} / (sqrt(v.nrm) * sqrt(c.cn)), 6) DESC,
       |      c.cid) AS crk
       |  FROM e v CROSS JOIN c),
       |asg AS (SELECT vec_id, cid AS cluster_id FROM asgr WHERE crk = 1),
       |r AS (SELECT vec_id, cluster_id,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS sample_rank
       |  FROM asg)
       |SELECT vec_id, cluster_id, CAST(sample_rank AS BIGINT) AS sample_rank
       |FROM r WHERE sample_rank <= 8
       |ORDER BY cluster_id, sample_rank""".stripMargin
  }

  // ---- neardup_clusters ---------------------------------------------

  /** Near-dup GROUPS: connected components over the MinHash pair graph,
    * cluster_id = smallest reachable doc_id. Label propagation on the
    * Spark side; the oracle computes the same closure with a recursive
    * CTE.
    */
  def neardupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.nearDupMinhash(docs(s, dir), "doc_id", "text",
      numPerms = 16, rowsPerBand = 4, shingleN = 3, threshold = 0.5)
    Dedup.dupClusters(pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy("doc_id")
  }

  private val neardupClustersOracle = {
    import graft.extra.Dedup.{minhashA, minhashB, MinhashP}
    val mins = (0 until 16)
      .map(i => s"  min((h * ${minhashA(i)} + ${minhashB(i)}) % $MinhashP) AS mh$i")
      .mkString(",\n")
    val bandSelects = (0 until 4).map { b =>
      val sig = (0 until 4).map(j => s"CAST(mh${b * 4 + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"  SELECT doc_id, $b AS band, $sig AS sig FROM mh"
    }.mkString("\n  UNION ALL\n")
    s"""WITH RECURSIVE $toksCte,
       |ss AS (SELECT doc_id, $shinglesSql AS shingles FROM t),
       |sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM ss),
       |hs AS (SELECT doc_id,
       |         CAST('0x' || substr(md5(shingle), 1, 12) AS BIGINT) AS h
       |       FROM sh),
       |mh AS (SELECT doc_id,
       |$mins
       |FROM hs GROUP BY doc_id),
       |bands AS (
       |$bandSelects),
       |$candCappedCtes,
       |j AS (SELECT c.id_a, c.id_b,
       |        len(list_intersect(x.shingles, y.shingles)) AS inter,
       |        len(x.shingles) + len(y.shingles)
       |          - len(list_intersect(x.shingles, y.shingles)) AS uni
       |      FROM cand c
       |      JOIN ss x ON x.doc_id = c.id_a
       |      JOIN ss y ON y.doc_id = c.id_b),
       |p AS (SELECT id_a, id_b FROM j
       |      WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM p
       |          UNION SELECT id_b, id_a FROM p),
       |reach AS (
       |  SELECT DISTINCT src AS id, src AS lab FROM edges
       |  UNION
       |  SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id)
       |SELECT id AS doc_id, min(lab) AS cluster_id
       |FROM reach
       |GROUP BY id
       |ORDER BY doc_id""".stripMargin
  }

  // ---- curate_docs --------------------------------------------------

  /** End-to-end curation verdict: quality gate → language gate → exact
    * dedup → MinHash near-dup removal → split assignment. One row per
    * input doc with its terminal status (the audit artifact; `kept` rows
    * carry the train/val/test split).
    */
  def curateDocs(s: SparkSession, dir: String): DataFrame =
    graft.extra.Curation.curate(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  private val curateDocsOracle = {
    import graft.extra.Dedup.{minhashA, minhashB, MinhashP}
    def hits(lang: String) = {
      val lst = graft.extra.Text.stopwords(lang)
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($lst, x)))"
    }
    val pred =
      s"""CASE
         |  WHEN ${hits("en")} >= ${hits("es")} AND ${hits("en")} >= ${hits("de")} AND ${hits("en")} >= ${hits("fr")} THEN 'en'
         |  WHEN ${hits("es")} >= ${hits("de")} AND ${hits("es")} >= ${hits("fr")} THEN 'es'
         |  WHEN ${hits("de")} >= ${hits("fr")} THEN 'de'
         |  ELSE 'fr' END""".stripMargin
    val mins = (0 until 16)
      .map(i => s"  min((h * ${minhashA(i)} + ${minhashB(i)}) % $MinhashP) AS mh$i")
      .mkString(",\n")
    val bandSelects = (0 until 4).map { b =>
      val sig = (0 until 4).map(j => s"CAST(mh${b * 4 + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"  SELECT doc_id, $b AS band, $sig AS sig FROM mh"
    }.mkString("\n  UNION ALL\n")
    val splitCase =
      """CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 80 THEN 'train'
        |       WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 90 THEN 'val'
        |       ELSE 'test' END""".stripMargin
    s"""WITH RECURSIVE tt AS (SELECT doc_id, text,
       |        list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
       |      FROM documents),
       |fl AS (SELECT doc_id, toks, md5(text) AS text_hash,
       |        (len(toks) < 15 OR
       |         round(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks)*0.5
       |           + least(CAST(${hits("en")} AS DOUBLE)/len(toks)*5.0, 1.0)*0.3
       |           + least(CAST(len(toks) AS DOUBLE)/100.0, 1.0)*0.2, 6) < 0.40)
       |          AS low_q,
       |        ($pred <> 'en') AS wrong_lang
       |      FROM tt),
       |canon AS (SELECT text_hash, min(doc_id) AS canon_id FROM fl
       |          WHERE NOT low_q AND NOT wrong_lang GROUP BY 1),
       |uq AS (SELECT f.doc_id, f.toks FROM fl f JOIN canon c
       |        ON f.text_hash = c.text_hash AND f.doc_id = c.canon_id),
       |ss AS (SELECT doc_id, $shinglesSql AS shingles FROM uq AS t),
       |sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM ss),
       |hs AS (SELECT doc_id,
       |         CAST('0x' || substr(md5(shingle), 1, 12) AS BIGINT) AS h
       |       FROM sh),
       |mh AS (SELECT doc_id,
       |$mins
       |FROM hs GROUP BY doc_id),
       |bands AS (
       |$bandSelects),
       |$candCappedCtes,
       |jj AS (SELECT c.id_a, c.id_b,
       |        len(list_intersect(x.shingles, y.shingles)) AS inter,
       |        len(x.shingles) + len(y.shingles)
       |          - len(list_intersect(x.shingles, y.shingles)) AS uni
       |       FROM cand c
       |       JOIN ss x ON x.doc_id = c.id_a
       |       JOIN ss y ON y.doc_id = c.id_b),
       |pp AS (SELECT id_a, id_b FROM jj
       |       WHERE CAST(inter AS DOUBLE)/uni >= 0.5),
       |eedges AS (SELECT id_a AS src, id_b AS dst FROM pp
       |           UNION SELECT id_b, id_a FROM pp),
       |rreach AS (
       |  SELECT DISTINCT src AS id, src AS lab FROM eedges
       |  UNION
       |  SELECT e.dst AS id, r.lab FROM rreach r JOIN eedges e ON e.src = r.id),
       |dropids AS (SELECT id AS doc_id FROM rreach
       |            GROUP BY id HAVING id <> min(lab)),
       |verdict AS (SELECT f.doc_id,
       |        CASE WHEN f.low_q THEN 'low_quality'
       |             WHEN f.wrong_lang THEN 'wrong_lang'
       |             WHEN f.doc_id <> c.canon_id THEN 'exact_dup'
       |             WHEN d.doc_id IS NOT NULL THEN 'near_dup'
       |             ELSE 'kept' END AS status
       |      FROM fl f
       |      LEFT JOIN canon c ON f.text_hash = c.text_hash
       |      LEFT JOIN dropids d ON d.doc_id = f.doc_id)
       |SELECT doc_id, status,
       |  CASE WHEN status = 'kept' THEN
       |    $splitCase
       |  END AS split
       |FROM verdict
       |ORDER BY doc_id""".stripMargin
  }

  // ---- train_test_split ---------------------------------------------

  /** Deterministic (partitioning-independent) train/val/test assignment
    * by content-hash bucket — per-doc assignment plus split counts.
    */
  def trainTestSplit(s: SparkSession, dir: String): DataFrame =
    graft.extra.Sampling.withSplit(docs(s, dir), "doc_id")
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  private val trainTestSplitOracle =
    """SELECT doc_id,
      |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
      |    % 100 AS bucket,
      |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 80 THEN 'train'
      |       WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Language-stratified deterministic sample: downsample dominant
    * English to 30%, keep 80% of French, 50% of everything else — the
    * corpus-rebalancing move, reproducible at any partitioning.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.extra.Sampling.stratifiedSample(docs(s, dir), "doc_id", "lang",
      Map("en" -> 0.3, "fr" -> 0.8), defaultFraction = 0.5)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  private val stratifiedSampleOracle =
    """SELECT doc_id, lang
      |FROM documents
      |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
      |      % 10000 <
      |      CASE WHEN lang = 'fr' THEN 8000
      |           WHEN lang = 'en' THEN 3000
      |           ELSE 5000 END
      |ORDER BY doc_id""".stripMargin

  /** Deterministic 10% sample of events joined back for verification:
    * the same rows are selected at ANY partitioning or engine.
    */
  def deterministicSample(s: SparkSession, dir: String): DataFrame =
    graft.extra.Sampling.deterministicSample(events(s, dir), "event_id", 0.1)
      .select("event_id", "event_type", "value")
      .orderBy("event_id")

  private val deterministicSampleOracle =
    """SELECT event_id, event_type, value
      |FROM events
      |WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12) AS BIGINT)
      |      % 10000 < 1000
      |ORDER BY event_id""".stripMargin

  // ---- mix_domains ----------------------------------------------------

  /** Weighted training-mixture over `source` domains: src0/src1 seen
    * 2.5 times per pass (epoch upsampling), src2 1.5×, src3 heavily
    * downsampled, everything else 1×. Pure projection + filter
    * ([[graft.extra.Sampling.mixDomains]]): no shuffle, reproducible on
    * any partitioning.
    */
  def mixDomains(s: SparkSession, dir: String): DataFrame =
    graft.extra.Sampling.mixDomains(docs(s, dir), "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 2.5, "src2" -> 1.5, "src3" -> 0.25))
      .select("doc_id", "source", "epoch")
      .orderBy("doc_id", "epoch")

  private val mixDomainsOracle =
    """WITH r AS (SELECT doc_id, source,
      |    CASE WHEN source = 'src0' THEN 25000
      |         WHEN source = 'src1' THEN 25000
      |         WHEN source = 'src2' THEN 15000
      |         WHEN source = 'src3' THEN 2500
      |         ELSE 10000 END AS rate10k
      |  FROM documents),
      |e AS (SELECT doc_id, source, rate10k,
      |    unnest(range(1, CAST((rate10k + 9999) // 10000 AS BIGINT) + 1))
      |      AS epoch
      |  FROM r)
      |SELECT doc_id, source, epoch FROM e
      |WHERE rate10k - (epoch - 1) * 10000 >= 10000
      |   OR CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':e' ||
      |        CAST(epoch AS VARCHAR)), 1, 12) AS BIGINT) % 10000
      |      < rate10k - (epoch - 1) * 10000
      |ORDER BY doc_id, epoch""".stripMargin

  // ---- quality_sample -------------------------------------------------

  /** Soft quality sampling: keep each doc with probability equal to its
    * quality score (hash-gated, [[graft.extra.Sampling.weightedSample]])
    * — proportional retention instead of a hard threshold cliff. Pure
    * projection + filter over one scan.
    */
  def qualitySample(s: SparkSession, dir: String): DataFrame = {
    val q = graft.extra.Text.withQuality(docs(s, dir), "text")
    graft.extra.Sampling.weightedSample(q, "doc_id", col("quality_score"))
      .select("doc_id", "quality_score")
      .orderBy("doc_id")
  }

  private val qualitySampleOracle = {
    val toksSql = "list_filter(string_split(lower(text), ' '), t -> t <> '')"
    val stop = graft.extra.Text.stopwords("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val hits = s"len(list_filter(toks, t -> list_contains($stop, t)))"
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |q AS (SELECT doc_id,
       |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.5
       |        + least(CAST($hits AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.3
       |        + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.2, 6)
       |    AS quality_score
       |  FROM t)
       |SELECT doc_id, quality_score FROM q
       |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
       |        AS BIGINT) % 10000 < quality_score * 10000.0
       |ORDER BY doc_id""".stripMargin
  }

  // ---- domain_quota ---------------------------------------------------

  /** Per-domain quality quota: the top 10 docs of every `source` by
    * (quality desc, doc_id) — capped per-domain representation, the
    * complement of rate-based mixing. A rank window PARTITIONED by
    * domain (group-limited top-k — never a global sort), ranking on the
    * rounded score for engine-independent order.
    */
  def domainQuota(s: SparkSession, dir: String): DataFrame = {
    val q = graft.extra.Text.withQuality(docs(s, dir), "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality_score").desc, col("doc_id"))
    q.withColumn("qrank", row_number().over(w))
      .filter(col("qrank") <= 10)
      .select(col("doc_id"), col("source"),
        col("qrank").cast("long").as("qrank"), col("quality_score"))
      .orderBy("source", "qrank")
  }

  private val domainQuotaOracle = {
    val toksSql = "list_filter(string_split(lower(text), ' '), t -> t <> '')"
    val stop = graft.extra.Text.stopwords("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val hits = s"len(list_filter(toks, t -> list_contains($stop, t)))"
    s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |q AS (SELECT doc_id, source,
       |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.5
       |        + least(CAST($hits AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.3
       |        + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.2, 6)
       |    AS quality_score
       |  FROM t),
       |r AS (SELECT *, row_number() OVER (PARTITION BY source
       |    ORDER BY quality_score DESC, doc_id) AS qrank FROM q)
       |SELECT doc_id, source, CAST(qrank AS BIGINT) AS qrank, quality_score
       |FROM r WHERE qrank <= 10
       |ORDER BY source, qrank""".stripMargin
  }

  // ---- global_shuffle -------------------------------------------------

  /** Deterministic global shuffle for training-data ordering: every doc
    * gets a stable pseudo-random position (row number over md5(doc_id)
    * order). Computed by [[graft.ops.Ranks.withGlobalRowNumber]] —
    * range shuffle + O(P) per-partition offsets, never the
    * single-partition `row_number() OVER (ORDER BY …)` window.
    */
  def globalShuffle(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.md5
    val (ranked, _) = graft.ops.Ranks.withGlobalRowNumber(
      docs(s, dir).select("doc_id"),
      Seq(md5(col("doc_id").cast("string")), col("doc_id")), "pos")
    ranked.select("doc_id", "pos").orderBy("doc_id")
  }

  private val globalShuffleOracle =
    """SELECT doc_id,
      |  row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |    AS pos
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- neardup_incremental --------------------------------------------

  /** Incremental ingest dedup: batch = doc_id % 10 < 2 (20% "new"),
    * corpus = the rest; per-new-doc verdict with the smallest matching
    * canonical id. The oracle replays the full minhash pipeline, keeps
    * only pairs touching a new doc, and orients each at its new side.
    */
  def neardupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.nearDupIncremental(
      d.filter(col("doc_id") % 10 >= 2), d.filter(col("doc_id") % 10 < 2),
      "doc_id", "text",
      numPerms = 16, rowsPerBand = 4, shingleN = 3, threshold = 0.5)
      .orderBy("doc_id")
  }

  private val neardupIncrementalOracle =
    s"""WITH $minhashPairCtes,
       |rel AS (
       |  SELECT CASE WHEN id_b % 10 < 2 THEN id_b ELSE id_a END AS nid,
       |         CASE WHEN id_b % 10 < 2 THEN id_a ELSE id_b END AS other
       |  FROM j
       |  WHERE CAST(inter AS DOUBLE)/uni >= 0.5
       |    AND (id_a % 10 < 2 OR id_b % 10 < 2)),
       |d AS (SELECT nid, min(other) AS dup_of FROM rel GROUP BY nid)
       |SELECT n.doc_id, d.nid IS NOT NULL AS is_dup, d.dup_of
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 < 2) n
       |LEFT JOIN d ON d.nid = n.doc_id
       |ORDER BY n.doc_id""".stripMargin

  // ---- dedup_lines ------------------------------------------------------

  /** LINE-level boilerplate dedup ([[graft.extra.Dedup
    * .removeDupLines]] — the CCNet/RefinedWeb paragraph discipline,
    * the granularity between whole-document and k-gram-span dedup):
    * the documents' texts are first shaped into 12-token "paragraphs"
    * joined by newlines (the corpus has no native line structure — the
    * derivation is deterministic and replayed by the oracle), then
    * every line occurring ≥ 2 times corpus-wide is cut from ALL its
    * documents (the boilerplate posture; navigation bars and cookie
    * banners are noise, not content) and each text is rebuilt in
    * original line order with removal counts.
    */
  def dedupLines(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val t = split(col("text"), " ")
    val paras = d.select(col("doc_id"),
      array_join(transform(
        sequence(lit(0),
          ceil(size(t) / lit(12.0)).cast("int") - 1),
        i => array_join(slice(t, i * 12 + 1, lit(12)), " ")), "\n")
        .as("text"))
    graft.extra.Dedup.removeDupLines(paras, "doc_id", "text",
        sep = "\n", minCount = 2)
      .orderBy("doc_id")
  }

  private val dedupLinesOracle =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |  FROM documents),
      |lines AS (
      |  SELECT doc_id, i AS line_no,
      |    array_to_string(t[(i*12+1):((i+1)*12)], ' ') AS line
      |  FROM toks, range(0, 64) r(i) WHERE i*12 < len(t)),
      |boiler AS (SELECT line FROM lines GROUP BY 1 HAVING count(*) >= 2),
      |m AS (SELECT l.doc_id, l.line_no, l.line,
      |    (b.line IS NOT NULL) AS cut
      |  FROM lines l LEFT JOIN boiler b ON l.line = b.line)
      |SELECT doc_id,
      |  coalesce(string_agg(CASE WHEN NOT cut THEN line END, chr(10)
      |    ORDER BY line_no), '') AS text,
      |  CAST(count(*) FILTER (cut) AS BIGINT) AS n_lines_removed,
      |  CAST(coalesce(sum(len(string_split(line, ' ')))
      |    FILTER (cut), 0) AS BIGINT) AS n_tokens_removed
      |FROM m GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---- neardup_index ----------------------------------------------------

  /** The PERSISTED-index form of `neardup_incremental`
    * ([[graft.extra.MinhashIndex]]): the corpus half's band postings
    * and shingle sets are a content-keyed build-if-absent artifact —
    * the bench's median-of-N reads the amortized serving cost (pruned
    * posting lookup + candidate-only shingle fetch), while the first
    * call pays the one-time build. Output is IDENTICAL to the
    * recompute form by construction (MinhashIndexSpec pins it), so it
    * shares the oracle.
    */
  def neardupIndex(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val idxDir = IndexedCorpus.minhashDir(
      d.filter(col("doc_id") % 10 >= 2), "doc_id", "text")
    graft.extra.MinhashIndex.dedupBatch(s, idxDir,
        d.filter(col("doc_id") % 10 < 2), "doc_id", "text",
        threshold = 0.5)
      .orderBy("doc_id")
  }

  // ---- interleave_domains ---------------------------------------------

  /** Domain-interleaved training order: per-domain deterministic rank
    * (grouped two-pass range-shuffle rank over md5 order — no
    * one-task-per-domain window) then a global position
    * over (domain_rank, source) via the distributed row-number. All
    * rank-1 docs across domains come first, then rank-2, … — consecutive
    * training batches see every domain instead of long same-domain runs
    * (the failure mode of a naive ORDER BY source ingest), and the order
    * is reproducible on any partitioning/engine.
    */
  def interleaveDomains(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.md5
    // per-domain rank via the grouped two-pass range shuffle: a window
    // PARTITION BY source puts the whole largest domain through one
    // task — at web scale the heaviest-tailed grouping there is
    val ranked = graft.ops.Ranks.withGroupedRowNumber(
      docs(s, dir).select("doc_id", "source"), Seq("source"),
      Seq(md5(col("doc_id").cast("string")), col("doc_id")),
      "domain_rank")
    val (positioned, _) = graft.ops.Ranks.withGlobalRowNumber(
      ranked, Seq(col("domain_rank"), col("source")), "train_pos")
    positioned.select("doc_id", "source", "domain_rank", "train_pos")
      .orderBy("doc_id")
  }

  private val interleaveDomainsOracle =
    """WITH r AS (SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS domain_rank
      |  FROM documents)
      |SELECT doc_id, source, CAST(domain_rank AS BIGINT) AS domain_rank,
      |  row_number() OVER (ORDER BY domain_rank, source) AS train_pos
      |FROM r
      |ORDER BY doc_id""".stripMargin

  // ---- fuzzy_match --------------------------------------------------

  /** Entity resolution: distinct part names fuzzy-joined against a
    * deterministically corrupted copy (one character replaced with '#'
    * at a length-derived position) — trigram blocking + exact
    * Levenshtein verify, dist ≤ 2. See [[graft.extra.Fuzzy.fuzzyJoin]].
    */
  def fuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val names = Tables.load(s, dir, "part")
      .select(col("p_name").as("name")).distinct()
    val pos = (length(col("name")) % 5) + 1
    val corrupted = names.select(col("name").as("src"),
      concat(col("name").substr(lit(1), pos - lit(1)), lit("#"),
        col("name").substr(pos + lit(1), length(col("name"))))
        .as("ctext"))
    graft.extra.Fuzzy.fuzzyJoin(
        names, "name", "name", corrupted, "src", "ctext", maxDist = 2)
      .orderBy("name_l", "src_r")
  }

  private val fuzzyOracle =
    """WITH lnames AS (SELECT DISTINCT p_name AS name FROM part),
      |r AS (SELECT name AS src,
      |  substr(name, 1, (length(name) % 5 + 1) - 1) || '#' ||
      |  substr(name, (length(name) % 5 + 1) + 1) AS ctext FROM lnames),
      |lg AS (SELECT name, unnest(list_distinct(
      |  [substr(name, i, 3) for i in range(1, length(name) - 1)])) AS g
      |  FROM lnames),
      |rg AS (SELECT src, ctext, unnest(list_distinct(
      |  [substr(ctext, i, 3) for i in range(1, length(ctext) - 1)])) AS g
      |  FROM r),
      |cand AS (SELECT DISTINCT lg.name, rg.src, rg.ctext
      |  FROM lg JOIN rg USING (g))
      |SELECT name AS name_l, src AS src_r,
      |  CAST(levenshtein(name, ctext) AS INT) AS dist
      |FROM cand WHERE levenshtein(name, ctext) <= 2
      |ORDER BY name_l, src_r""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("fuzzy_match",
      "entity resolution: trigram-blocked Levenshtein join (dist<=2)",
      fuzzyMatch, Some(fuzzyOracle)),
    QueryDef("mix_domains",
      "weighted per-domain epoch mixing (2.5x/1.5x/0.25x rates, hash-gated)",
      mixDomains, Some(mixDomainsOracle)),
    QueryDef("global_shuffle",
      "deterministic global shuffle position without a one-task window",
      globalShuffle, Some(globalShuffleOracle)),
    QueryDef("interleave_domains",
      "round-robin domain interleave: keyed rank window + global position",
      interleaveDomains, Some(interleaveDomainsOracle)),
    QueryDef("quality_sample",
      "soft quality sampling: keep probability = quality score, hash-gated",
      qualitySample, Some(qualitySampleOracle)),
    QueryDef("domain_quota",
      "per-domain top-10 quality quota via a group-limited rank window",
      domainQuota, Some(domainQuotaOracle)),
    QueryDef("train_test_split",
      "hash-bucket deterministic train/val/test assignment",
      trainTestSplit, Some(trainTestSplitOracle)),
    QueryDef("deterministic_sample",
      "partitioning-independent 10% content-hash sample",
      deterministicSample, Some(deterministicSampleOracle)),
    QueryDef("stratified_sample",
      "per-language deterministic rebalancing sample (en 30%, fr 80%, rest 50%)",
      stratifiedSample, Some(stratifiedSampleOracle)),
    QueryDef("dedup_exact",
      "exact content-hash dedup (hash-groupBy, deterministic canonical)",
      dedupExact, Some(dedupExactOracle)),
    QueryDef("dedup_latest",
      "keyed latest-wins dedup (update-mode finalizer)",
      dedupLatest, Some(dedupLatestOracle)),
    QueryDef("snapshot_timetravel",
      "manifest-versioned last-wins table: v0 and v1 served side by " +
        "side from their snapshots (cold files shared by reference)",
      snapshotTimetravel, Some(snapshotTimetravelOracle)),
    QueryDef("version_diff",
      "CDC extract between snapshot versions from ONLY the non-shared " +
        "data files (O(files replaced), not O(table))",
      versionDiff, Some(versionDiffOracle)),
    QueryDef("point_lookup",
      "snapshot serving read: five keys open only manifest-range-" +
        "matched files (one manifest read, zero footer opens)",
      pointLookup, Some(pointLookupOracle)),
    QueryDef("snapshot_range_read",
      "time-window read via manifest-recorded secondary-column stats " +
        "(file skipping on a non-cluster column)",
      snapshotRangeRead, Some(snapshotRangeReadOracle)),
    QueryDef("snapshot_sql_tvf",
      "SQL time travel via the graft_snapshot table-valued function " +
        "(injectTableFunction)",
      snapshotSqlTvf, Some(snapshotSqlTvfOracle)),
    QueryDef("snapshot_zorder_read",
      "the range-read window served from a Z-ORDERED snapshot " +
        "(Morton-curve clustering, multi-dim manifest stats)",
      snapshotZorderRead, Some(snapshotRangeReadOracle)),
    QueryDef("snapshot_ts_travel",
      "TIMESTAMP AS OF time travel: commit-stamp resolution via " +
        "readAsOfTime and a TIMESTAMP literal in the TVF",
      snapshotTsTravel, Some(snapshotTimetravelOracle)),
    QueryDef("snapshot_restore",
      "append-only rollback: RESTORE commits the target's content as " +
        "a new head (manifest-only, files shared by name); pre-" +
        "rollback head still travels",
      snapshotRestore, Some(snapshotRestoreOracle)),
    QueryDef("cdc_view_stream",
      "streamed CDC versions (exactly-once sink) maintaining a " +
        "retraction-correct incremental view == one-shot aggregate",
      cdcViewStream, Some(cdcViewStreamOracle)),
    QueryDef("neardup_minhash",
      "MinHash(16 perms)+LSH(4 bands) near-dup pairs, Jaccard>=0.5",
      neardupMinhash, Some(neardupMinhashOracle)),
    QueryDef("neardup_incremental",
      "batch-vs-corpus ingest dedup verdict (batch-driven candidates)",
      neardupIncremental, Some(neardupIncrementalOracle)),
    QueryDef("neardup_index",
      "the same verdict served from a PERSISTED MinHash band index " +
        "(pruned posting lookup + candidate-only shingle fetch)",
      neardupIndex, Some(neardupIncrementalOracle)),
    QueryDef("dedup_lines",
      "CCNet-style line/paragraph boilerplate dedup: corpus-repeated " +
        "lines cut from every doc, text rebuilt in order",
      dedupLines, Some(dedupLinesOracle)),
    QueryDef("cluster_sample",
      "cluster-stratified diversity sampling: top-8 per semantic " +
        "cluster in content-hash order",
      clusterSample, Some(clusterSampleOracle)),
    QueryDef("ngram_jaccard",
      "exact 3-gram Jaccard via inverted shingle index",
      ngramJaccard, Some(ngramJaccardOracle)),
    QueryDef("simhash",
      "20-bit SimHash signatures (expression-native char hashing)",
      simhashDocs, Some(simhashOracle)),
    QueryDef("neardup_embedding",
      "embedding-cosine near-dup (multi-table LSH candidates + exact verify)",
      neardupEmbedding, Some(neardupEmbeddingOracle)),
    QueryDef("semdedup",
      "SemDeDup: coarse-cluster + within-cluster cosine, min-id kept",
      semdedupVectors, Some(semdedupOracle)),
    QueryDef("curate_docs",
      "end-to-end curation verdict: quality → lang → exact dedup → " +
        "near-dup → split",
      curateDocs, Some(curateDocsOracle)),
    QueryDef("neardup_clusters",
      "connected components over MinHash pairs (cluster = min doc_id)",
      neardupClusters, Some(neardupClustersOracle)))
}
