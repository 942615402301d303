package graft.extra

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Persisted BM25 index — the sparse-retrieval mirror of [[AnnIndex]]:
  * the expensive per-corpus work (tokenize + explode + three keyed
  * aggregations) is paid ONCE at build time and written to storage;
  * every search afterwards reads term-pruned slices of the tf frame and
  * one constant-size meta row, never the raw corpus. This kills the two
  * structural costs of [[Retrieval.bm25SearchAll]] at scale: the
  * per-call corpus re-tokenization (a full text scan per query batch)
  * and its two eager driver actions (`docs.count()` + the avgdl head).
  *
  * Layout under `dir`:
  *   - `tf/` — (id, term, tf) parquet, RANGE-CLUSTERED on `term`
  *     ([[Layout.writeClustered]]): each file covers a disjoint sorted
  *     term range, so the search's `term IN (…)` predicate prunes whole
  *     files on parquet footer min/max — the posting-list read. At
  *     100 TB this is the index table: a Q-term search reads the ≤Q
  *     files whose ranges cover its terms, never the corpus.
  *   - `dl/` — (id, dl): per-doc token length, keyed by id (joined
  *     keyed on the scored rows — |query|·df(term)-bounded, never
  *     corpus-wide).
  *   - `df/` — (term, df): per-term document frequency, same term
  *     clustering; the search reads its Q terms and broadcasts.
  *   - `meta/` — (n_docs, sum_dl): the only scalars scoring needs.
  *     Reading it replaces both eager driver actions.
  *   - `tombstones/` — (id), present only after a [[delete]]: ids the
  *     searches anti-join out until [[compact]] makes the deletion
  *     physical (Lucene-style deferred purge — see [[delete]]).
  *
  * The layout is LOG-STRUCTURED: `df/` and `meta/` hold PARTIAL counts
  * (one set per build/append) that the search read aggregates — a sum
  * over the |query|-bounded df slice and the O(#appends)-row meta, both
  * trivial at read time. That makes incremental ingest ([[append]])
  * pure parquet appends on all four frames: no compact-and-rewrite, no
  * read-modify-write races, and append-then-search is bit-identical to
  * a fresh build over the union (Bm25IndexSpec pins it).
  *
  * Search ≡ [[Retrieval.bm25Search]]/[[Retrieval.bm25SearchAll]]
  * bit-for-bit: df per term is the global document frequency (equal to
  * the per-call `tfq` re-count — both count docs containing the term),
  * n_docs/sum_dl reproduce `docs.count()`/`sum(dl)` exactly, and the
  * scoring arithmetic is the same 12-dp DECIMAL contribution sum
  * rounded to 6 dp with (score DESC, id ASC) ties. Bm25IndexSpec pins
  * the equivalence and that a search never touches the documents table.
  */
object Bm25Index {

  /** Tokenize the corpus once and persist tf/dl/df/meta. One explode
    * shuffle builds tf; dl, df, and the meta scalars are re-aggregated
    * from it (the raw text is scanned exactly once). `numFiles` sets
    * the term-range file count of `tf/` — size it so each file is
    * ~128 MB at the target corpus (the usual parquet scan sweet spot).
    */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
      numFiles: Int = 8, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs.select(col(idCol).as("id"),
        explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    // house cache rule: tf feeds four consumers (tf/, dl/, df/, meta);
    // materialize once, release before returning
    try {
      Layout.writeClustered(tf, s"$dir/tf",
        Seq(col("term"), col("id")), numFiles, mode)
      tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
        .repartition(1).sortWithinPartitions(col("id"))
        .write.mode(mode).parquet(s"$dir/dl")
      Layout.writeClustered(
        tf.groupBy(col("term")).agg(count(lit(1)).as("df")),
        s"$dir/df", Seq(col("term")), math.max(1, numFiles / 4), mode)
      // n_docs is the CORPUS row count (docs with zero tokens included
      // — bm25Search counts them too); sum_dl re-aggregates tf
      val nDocs = docs.count()
      val sumDl = tf.agg(sum(col("tf"))).head().getLong(0)
      Seq((nDocs, sumDl)).toDF("n_docs", "sum_dl")
        .coalesce(1).write.mode(mode).parquet(s"$dir/meta")
    } finally tf.unpersist(blocking = false)
  }

  /** Incrementally ingest a NEW batch of documents into a persisted
    * index — the sparse mirror of [[AnnIndex.appendIvfPq]]: one batch
    * tokenization + four parquet APPENDS (tf/dl rows, partial df
    * counts, one partial meta row); the existing corpus is never
    * re-tokenized or rewritten. Appended tf files are range-clustered
    * over the batch's own term ranges, so footer pruning keeps working
    * per file. Caller owns id-uniqueness across batches (the same
    * contract as every keyed table here); searching after N appends is
    * bit-identical to one build over the union.
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      dir: String, numFiles: Int = 8): Unit =
    build(docs, idCol, textCol, dir, numFiles, SaveMode.Append)

  private def tombPath(dir: String) = s"$dir/tombstones"

  private def readTombstones(spark: SparkSession, dir: String)
      : Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tombPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(tombPath(dir))) else None
  }

  /** Delete documents from the index — the takedown mirror of
    * [[graft.extra.Merge.delete]] for the sparse arm, LSM-style (the
    * Lucene precedent: deletes are cheap markers, merges make them
    * physical):
    *
    *   - the ids are appended to a `tombstones/` frame (pure parquet
    *     append, O(batch) — the posting lists are NOT rewritten);
    *   - every search anti-joins its candidate rows against the
    *     tombstones, so deleted docs stop matching IMMEDIATELY and
    *     lower-ranked docs fill the top-k;
    *   - `n_docs`/`sum_dl` stay EXACT: each tombstone row carries its
    *     doc's meta contribution (dl presence + value), and every
    *     reader nets meta against the tombstone frame — one append,
    *     no second write to crash between;
    *   - per-term df stays STALE until [[compact]] (correcting it needs
    *     the deleted docs' term lists, i.e. an id-keyed pass over the
    *     term-clustered tf — exactly the scan LSM engines defer to the
    *     merge; Lucene's docFreq ignores deletes the same way). Scores
    *     of surviving docs can therefore differ slightly from a fresh
    *     build until compaction; membership never does.
    *
    * Ids absent from the index are tombstoned harmlessly; re-deleting
    * an id is a no-op (meta is never double-subtracted). Re-ADDING a
    * tombstoned id via [[append]] requires a [[compact]] first — the
    * tombstone would otherwise suppress the new rows too (caller
    * contract, same id-uniqueness ownership as append). Caveat: a
    * zero-token doc has no dl row, so deleting one leaves it inside
    * n_docs until a full rebuild — it never matches a term either way.
    *
    * Returns the number of newly tombstoned ids.
    */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String = "id"): Long = {
    val incoming = ids.select(col(idCol).as("id")).distinct()
    val newIds = readTombstones(spark, dir)
      .fold(incoming)(t =>
        incoming.join(t.select("id"), Seq("id"), "left_anti"))
      .persist()
    try {
      val nNew = newIds.count()
      if (nNew == 0) return 0L
      // ONE atomic append: each tombstone CARRIES its doc's meta
      // contribution (n = had a dl row, s = its dl), and readers net
      // n_docs/sum_dl out of the tombstone frame itself — a separate
      // negative-meta write (the first design) left a crash window
      // between the two appends in which a retried delete would
      // double-subtract meta
      newIds
        .join(spark.read.parquet(s"$dir/dl"), Seq("id"), "left_outer")
        .select(col("id"),
          when(col("dl").isNotNull, lit(1L)).otherwise(lit(0L)).as("n"),
          coalesce(col("dl"), lit(0L)).as("s"))
        .coalesce(1).write.mode(SaveMode.Append).parquet(tombPath(dir))
      nNew
    } finally newIds.unpersist(blocking = false): Unit
  }

  /** Net (n_docs, sum_dl): the meta partials minus the tombstoned
    * docs' carried contributions — every reader's one source of truth
    * for the scoring scalars.
    */
  private def netMeta(spark: SparkSession, dir: String): (Long, Long) = {
    val m = spark.read.parquet(s"$dir/meta")
      .agg(coalesce(sum("n_docs"), lit(0L)).as("n"),
        coalesce(sum("sum_dl"), lit(0L)).as("s")).head()
    val (tn, ts) = readTombstones(spark, dir).map { t =>
      val r = t.agg(coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("s"), lit(0L)).as("s")).head()
      (r.getLong(0), r.getLong(1))
    }.getOrElse((0L, 0L))
    (m.getLong(0) - tn, m.getLong(1) - ts)
  }

  /** Periodic maintenance for an appended index (the LSM compaction
    * half of the append story, same precedent as
    * [[graft.streaming.StreamingPipeline.materializeServing]]): each
    * append adds small tf/dl files and another df/meta partial;
    * compaction rewrites the four frames into one fresh clustered
    * layout — tf re-range-clustered across the FULL term space (file
    * pruning sharpens back up), df/meta partials merged to final
    * counts, dl re-sorted. Searches before and after are bit-identical
    * (spec-pinned); run it on the cadence appends accumulate. The swap
    * is directory-rename best-effort (write aside, then move) — the
    * maintenance job owns exclusivity, the same contract as any
    * compaction.
    */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 8): Unit = {
    import spark.implicits._
    val tmp = s"$dir.compact_tmp"
    val tomb = readTombstones(spark, dir)
    // tombstones become physical here: tf/dl rows dropped, and the
    // deleted docs' term lists — read from tf BEFORE the drop; the
    // index itself is the only surviving record of them — yield the
    // per-term df correction that delete() deferred (the one id-keyed
    // pass over the term-clustered tf, paid at merge time as in any
    // LSM engine). After the swap the tombstone frame is gone (not
    // copied into tmp) and df is exact again.
    val tf0 = spark.read.parquet(s"$dir/tf")
    val (tfKept, dfCorr) = tomb match {
      case None => (tf0, None)
      case Some(t) =>
        val corr = tf0.join(t, Seq("id")).groupBy(col("term"))
          .agg(count(lit(1)).as("__dfdel"))
        (tf0.join(t, Seq("id"), "left_anti"), Some(corr))
    }
    Layout.writeClustered(tfKept, s"$tmp/tf",
      Seq(col("term"), col("id")), numFiles)
    val dl0 = spark.read.parquet(s"$dir/dl")
    val dlKept = tomb.fold(dl0)(t => dl0.join(t, Seq("id"), "left_anti"))
    dlKept.repartition(1).sortWithinPartitions(col("id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/dl")
    val dfSummed = spark.read.parquet(s"$dir/df")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val dfFinal = dfCorr match {
      case None => dfSummed
      case Some(corr) => dfSummed
        .join(corr, Seq("term"), "left_outer")
        .withColumn("df", col("df") - coalesce(col("__dfdel"), lit(0L)))
        .drop("__dfdel")
        .filter(col("df") > 0)
    }
    Layout.writeClustered(dfFinal,
      s"$tmp/df", Seq(col("term")), math.max(1, numFiles / 4))
    // net of the tombstones' carried contributions — the tombstone
    // frame is dropped by the swap, so its correction bakes in here
    val (mN, mS) = netMeta(spark, dir)
    Seq((mN, mS)).toDF("n_docs", "sum_dl")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$tmp/meta")
    // swap: remove the old layout, move the compacted one into place
    // (filesystem resolved FROM the path — FileSystem.get(conf) would
    // bind the default FS and throw Wrong-FS for any other scheme)
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"compact: rename $tmp -> $dir failed")
  }

  /** Multi-query search over a persisted index: identical semantics and
    * arithmetic to [[Retrieval.bm25SearchAll]], but the corpus never
    * appears — tf is read term-pruned from the index layout, df/idf is
    * read (not re-counted) and broadcast, and the only driver value is
    * the one-row meta read. Output: queryIdCol, idCol, `n_hits`,
    * `score` — topK rows per query.
    *
    * `maxDfRatio` is the production STOP-TERM knob (Lucene-family
    * common-terms handling): a query term present in more than that
    * fraction of the corpus contributes ~nothing to ranking (shifted
    * idf ≈ ln(1+ε)) yet drags df(term) ≈ N rows through the scan, the
    * per-query fan-out join, and the per-(query, doc) aggregation — at
    * 1M synthetic docs the 8 universal stopwords alone blew a 200-term
    * search to 20M aggregated rows and ~25 s (Profile `bm25idx`).
    * Pruning happens at the df frame (read FIRST, |query| rows), so
    * dropped terms never reach the tf scan at all. Default 1.0 = off —
    * bit-parity with [[Retrieval.bm25SearchAll]] preserved. When on:
    * searching "q₁ … qₙ" ≡ the default search of the query with its
    * high-df terms removed (docs matching ONLY dropped terms don't
    * appear; `n_hits` counts kept-term matches) — Bm25IndexSpec pins
    * that equivalence exactly.
    */
  def searchAll(spark: SparkSession, dir: String, queries: DataFrame,
      queryIdCol: String, queryTextCol: String, idCol: String = "id",
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 20,
      maxDfRatio: Double = 1.0): DataFrame = {
    require(maxDfRatio > 0.0 && maxDfRatio <= 1.0,
      s"maxDfRatio must be in (0, 1], got $maxDfRatio")
    import spark.implicits._
    // meta rows are per-build/append partials (log-structured layout),
    // net of tombstoned docs' carried contributions
    val (nDocs, sumDl) = netMeta(spark, dir)
    val avgdl = sumDl.toDouble / nDocs.toDouble

    val qterms = queries.select(col(queryIdCol),
        explode(Text.tokens(col(queryTextCol))).as("term"))
      .distinct()
    // Term-pruned posting read. A broadcast equijoin alone restricts
    // ROWS but pushes nothing into the scan — the first cut of this
    // path read the whole tf table and filtered after decode (measured
    // at 1M docs / 28M tf rows: the full scan dominated the search
    // wall). Queries are FEW by construction (the same constant-size
    // precedent as searchIvfPq's driver-side probe lists), so the
    // distinct query terms are collected and shipped back as a STATIC
    // `term IN (…)` predicate: parquet pushes it to row groups and —
    // against the range-clustered layout — skips whole files on footer
    // min/max. The guard keeps a runaway query frame from building a
    // million-literal filter; past it, the broadcast join still bounds
    // the rows (correctness never depends on the pushdown).
    val termSeq = qterms.select("term").distinct()
      .limit(10001).as[String].collect().toSeq
    def inPruned(df0: DataFrame, ts: Seq[String]): DataFrame =
      if (ts.isEmpty) df0.filter(lit(false)) // all-stop query → no hits
      else if (ts.size <= 10000) df0.filter(col("term").isin(ts: _*))
      else df0
    // df first: |query|-bounded rows, and the stop-term cut (if any)
    // happens HERE, before the tf scan ever sees the terms. The sum
    // merges per-append partial counts (and is a no-op on one build).
    val dfRead = inPruned(spark.read.parquet(s"$dir/df"), termSeq)
      .join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val dfKept =
      if (maxDfRatio >= 1.0) dfRead
      else dfRead.filter(
        col("df") <= lit((maxDfRatio * nDocs.toDouble).toLong))
    val keptSeq =
      if (maxDfRatio >= 1.0) termSeq
      else dfKept.select("term").as[String].collect().toSeq
    val tfq = inPruned(spark.read.parquet(s"$dir/tf"), keptSeq)
      .join(broadcast(dfKept.select("term")), "term")
    val idf = dfKept
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))

    val tfD = col("tf").cast("double")
    val contrib = round(
      col("idf") * ((tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / lit(avgdl))))),
      12).cast(DecimalType(30, 12))

    // tombstoned docs drop out of the candidates here — before the
    // rank window, so lower-ranked survivors fill the top-k (see
    // delete(): membership is exact immediately, df exact after compact)
    val tfLive = readTombstones(spark, dir)
      .fold(tfq)(t => tfq.join(t, Seq("id"), "left_anti"))
    val scored = tfLive
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(idf.select("term", "idf")), Seq("term"))
      .join(spark.read.parquet(s"$dir/dl"), Seq("id"))
      .groupBy(col(queryIdCol), col("id"))
      .agg(count(lit(1)).as("n_hits"),
        round(sum(contrib).cast("double"), 6).as("score"))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= topK)
      .drop("__rank")
      .withColumnRenamed("id", idCol)
  }

  /** Single-query search — [[Retrieval.bm25Search]] over the persisted
    * layout: same output shape (idCol, `n_hits`, `score`), same total
    * (score DESC, id ASC) order, topK rows.
    */
  def search(spark: SparkSession, dir: String, queryTerms: Seq[String],
      idCol: String = "id", k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20, maxDfRatio: Double = 1.0): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(maxDfRatio > 0.0 && maxDfRatio <= 1.0,
      s"maxDfRatio must be in (0, 1], got $maxDfRatio")
    import spark.implicits._
    val terms0 = queryTerms.map(_.toLowerCase).distinct
    // meta/df partials aggregate at read (log-structured layout), net
    // of tombstoned docs' carried contributions
    val (nDocs, sumDl) = netMeta(spark, dir)
    val avgdl = sumDl.toDouble / nDocs.toDouble
    def dfSlice(ts: Seq[String]) = spark.read.parquet(s"$dir/df")
      .filter(col("term").isin(ts: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    // the term list is already driver-side: static IN predicates push
    // straight to the parquet scans (file skip on the range-clustered
    // layout's footer stats — see searchAll's pushdown note); the
    // stop-term cut (searchAll scaladoc) reads the |query|-row df
    // slice first so dropped terms never reach the tf scan
    val terms =
      if (maxDfRatio >= 1.0) terms0
      else dfSlice(terms0)
        .filter(col("df") <= lit((maxDfRatio * nDocs.toDouble).toLong))
        .select("term").as[String].collect().toSeq
    if (terms.isEmpty) // every query term was stop-cut → no hits
      return spark.read.parquet(s"$dir/dl").filter(lit(false))
        .select(col("id").as(idCol), lit(0L).as("n_hits"),
          lit(0.0).as("score")) // id keeps the corpus key's real type
    val tfq0 = spark.read.parquet(s"$dir/tf")
      .filter(col("term").isin(terms: _*))
    // tombstone anti-join — see searchAll; bounded by the term-pruned
    // candidate rows, not the corpus
    val tfq = readTombstones(spark, dir)
      .fold(tfq0)(t => tfq0.join(t, Seq("id"), "left_anti"))
    val idf = dfSlice(terms)
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
    val tfD = col("tf").cast("double")
    val contrib = round(
      col("idf") * ((tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / lit(avgdl))))),
      12).cast(DecimalType(30, 12))
    tfq.join(broadcast(idf.select("term", "idf")), "term")
      .join(spark.read.parquet(s"$dir/dl"), "id")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"),
        round(sum(contrib).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
      .withColumnRenamed("id", idCol)
  }
}
