package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct
import graft.plans.AsOfStrategy

/** Session-extension entry point — the standard deployment hook for
  * graft's custom Catalyst pieces:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * wires, at session build time and with no code changes in the user's
  * job:
  *   - `graft_dot(a, b)` — the codegen [[DotProduct]] expression — into
  *     the SQL function registry (usable from `spark.sql`, views, and
  *     the Column API via `expr`);
  *   - [[AsOfStrategy]] into the planner, so [[graft.plans.AsOf]]
  *     logical nodes plan without the per-session registration
  *     `AsOf.asofJoin` otherwise performs.
  *
  * [[GraftExtensions.registerAll]] is the same wiring for an ALREADY
  * RUNNING session (notebooks, tests) — idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectTableFunction(GraftExtensions.snapshotTvf)
    ext.injectTableFunction(GraftExtensions.snapshotHistoryTvf)
    ext.injectTableFunction(GraftExtensions.asofTvf)
    ext.injectTableFunction(GraftExtensions.bm25Tvf)
    ext.injectTableFunction(GraftExtensions.dedupSpansTvf)
    ext.injectTableFunction(GraftExtensions.annTvf)
    ext.injectTableFunction(GraftExtensions.neardupTvf)
    ext.injectTableFunction(GraftExtensions.substrIncTvf)
    ext.injectTableFunction(GraftExtensions.semdedupTvf)
    ext.injectTableFunction(GraftExtensions.indexStatsTvf)
    ext.injectTableFunction(GraftExtensions.classifyTvf)
    ext.injectTableFunction(GraftExtensions.bpeCountTvf)
    ext.injectTableFunction(GraftExtensions.perplexityTvf)
    ext.injectPlannerStrategy(_ => AsOfStrategy)
  }
}

object GraftExtensions {

  private[graft] val dotFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot",
        "graft_dot(a, b) - dot product of two float/double arrays " +
          "(codegen; folds the shorter length, null elements null " +
          "the result)"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot expects 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      })

  /** `graft_snapshot('dir'[, version | TIMESTAMP])` — a TABLE-VALUED
    * FUNCTION over [[graft.extra.Snapshots]]: time travel straight
    * from SQL,
    *
    *   SELECT * FROM graft_snapshot('/data/corpus', 3)
    *   SELECT * FROM graft_snapshot('/data/corpus',
    *                                TIMESTAMP '2026-01-03 00:00:00')
    *   SELECT count(*) FROM graft_snapshot('/data/corpus')
    *
    * An integral second argument pins a VERSION NUMBER; a timestamp
    * second argument is `TIMESTAMP AS OF` — the latest version whose
    * commit stamp is ≤ the literal ([[graft.extra.Snapshots
    * .versionAsOf]]), how reproducible training runs pin "the corpus
    * as of <wall time>". Planned exactly like
    * [[graft.extra.Snapshots.read]] (manifest file list, recorded
    * schema, no footer opens) — the analyzer calls the builder once
    * with LITERAL arguments and receives the resolved relation.
    * Joins/views/CTEs over it compose as with any table.
    */
  private[graft] val snapshotTvf: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical
        .LogicalPlan) =
    (FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo("graft.extra.Snapshots", "graft_snapshot",
        "graft_snapshot(dir[, version | timestamp]) - rows of a " +
          "snapshot-table version (latest when omitted; a timestamp " +
          "resolves TIMESTAMP AS OF); arguments must be constant " +
          "literals. Resolution happens ONCE, at analysis time: a " +
          "view/CTE defined over graft_snapshot pins whatever version " +
          "the dir/timestamp resolved to when the view body was " +
          "analyzed, and does NOT track later commits"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty && children.length <= 2,
          s"graft_snapshot expects (dir[, version | timestamp]), got " +
            s"${children.length} arguments")
        def folded(e: Expression, what: String): Any = {
          require(e.foldable, s"graft_snapshot $what must be a literal")
          // foldable ≠ evaluable HERE: current_timestamp() et al. are
          // foldable but only substituted later by the optimizer's
          // ComputeCurrentTime — eval() at analysis time throws an
          // opaque UnsupportedOperationException. Surface the real
          // contract instead.
          try e.eval()
          catch { case scala.util.control.NonFatal(_) =>
            throw new IllegalArgumentException(
              s"graft_snapshot $what must be a constant literal " +
                "evaluable at analysis time (e.g. TIMESTAMP '2026-01-03" +
                " 00:00:00'); expressions like current_timestamp() " +
                "are substituted only at optimization time and cannot " +
                "pin a snapshot version here")
          }
        }
        val dir = folded(children.head, "dir") match {
          case null => throw new IllegalArgumentException(
            "graft_snapshot dir must not be NULL")
          case s => s.toString
        }
        val spark = SparkSession.active
        val asOf = children.lift(1).map { e =>
          import org.apache.spark.sql.types.{TimestampNTZType,
            TimestampType}
          e.dataType match {
            // timestamp literals eval to epoch MICROS; NTZ is read as
            // UTC wall time, matching the UTC-stamped commit clock
            case TimestampType | TimestampNTZType =>
              val micros = folded(e, "timestamp") match {
                case null => throw new IllegalArgumentException(
                  "graft_snapshot timestamp must not be NULL")
                case l: java.lang.Long => l.longValue
                case o => throw new IllegalArgumentException(
                  s"unexpected timestamp literal value $o")
              }
              graft.extra.Snapshots.versionAsOf(spark, dir,
                Math.floorDiv(micros, 1000L))
            case _ => folded(e, "version") match {
              // integral types only: a Double/Decimal literal would
              // silently truncate (1.9 → version 1) — reject instead
              case b: java.lang.Byte => b.longValue
              case s: java.lang.Short => s.longValue
              case i: java.lang.Integer => i.longValue
              case l: java.lang.Long => l.longValue
              case o => throw new IllegalArgumentException(
                s"graft_snapshot version must be an integral or " +
                  s"timestamp literal, got $o")
            }
          }
        }
        graft.extra.Snapshots.read(spark, dir, asOf)
          .queryExecution.analyzed
      })

  /** `graft_snapshot_history('dir')` — DESCRIBE HISTORY as a TVF:
    * one row per retained version (version, commit_ts, txn_app_id,
    * txn_batch_id, n_files, format) via
    * [[graft.extra.Snapshots.history]] — O(versions) manifest-header
    * reads, no chunk expansion, composable in joins like any table.
    */
  private[graft] val snapshotHistoryTvf: (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => org.apache.spark.sql.catalyst
        .plans.logical.LogicalPlan) =
    (FunctionIdentifier("graft_snapshot_history"),
      new ExpressionInfo("graft.extra.Snapshots",
        "graft_snapshot_history",
        "graft_snapshot_history(dir) - commit history of a snapshot " +
          "table, one row per retained version; dir must be a literal"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_snapshot_history expects (dir), got " +
            s"${children.length} arguments")
        require(children.head.foldable,
          "graft_snapshot_history dir must be a literal")
        val dir = children.head.eval() match {
          case null => throw new IllegalArgumentException(
            "graft_snapshot_history dir must not be NULL")
          case s => s.toString
        }
        graft.extra.Snapshots.history(SparkSession.active, dir)
          .queryExecution.analyzed
      })

  /** `graft_index_stats('dir')` — operational introspection of any
    * manifest-committed index as a TVF: one row per live segment
    * (version, frame, segment, bytes, files) + one per ledger token
    * ([[graft.extra.IndexStats.stats]]); zero rows for an uncommitted
    * path. Driver FS metadata only.
    */
  private[graft] val indexStatsTvf: (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical
      .LogicalPlan) =
    (FunctionIdentifier("graft_index_stats"),
      new ExpressionInfo("graft.extra.IndexStats", "graft_index_stats",
        "graft_index_stats(dir) - live segments + ledger tokens of a " +
          "manifest-committed index (version, frame, segment, bytes, " +
          "files); dir must be a literal"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_index_stats expects (dir), got " +
            s"${children.length} arguments")
        val dir = litString(children.head, "graft_index_stats", "dir")
        graft.extra.IndexStats.stats(SparkSession.active, dir)
          .queryExecution.analyzed
      })

  private type TvfDef = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical
      .LogicalPlan)

  /** Evaluate a TVF argument that must be a constant string literal. */
  private def litString(e: Expression, fn: String, what: String): String = {
    require(e.foldable, s"$fn $what must be a literal")
    e.eval() match {
      case null => throw new IllegalArgumentException(
        s"$fn $what must not be NULL")
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case o => o.toString
    }
  }

  private def litLong(e: Expression, fn: String, what: String): Long = {
    require(e.foldable, s"$fn $what must be a literal")
    e.eval() match {
      case b: java.lang.Byte => b.longValue
      case s: java.lang.Short => s.longValue
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
      case o => throw new IllegalArgumentException(
        s"$fn $what must be an integral literal, got $o")
    }
  }

  private def litDouble(e: Expression, fn: String, what: String): Double = {
    require(e.foldable, s"$fn $what must be a literal")
    e.eval() match {
      case d: java.lang.Double => d.doubleValue
      case f: java.lang.Float => f.doubleValue
      case b: java.lang.Byte => b.doubleValue
      case s: java.lang.Short => s.doubleValue
      case i: java.lang.Integer => i.doubleValue
      case l: java.lang.Long => l.doubleValue
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case o => throw new IllegalArgumentException(
        s"$fn $what must be a numeric literal, got $o")
    }
  }

  /** `graft_asof(left, right, key, ts, carryCsv[, direction[, tol]])` —
    * the native as-of join as a TVF over REGISTERED TABLE/VIEW NAMES
    * (TVF arguments are literal expressions, so relations arrive by
    * name — the standard workaround until SQL-standard table
    * arguments):
    *
    *   SELECT * FROM graft_asof('trades', 'quotes', 'symbol', 'ts',
    *                            'bid,ask', 'backward', 60)
    *
    * Left rows plus `asof_<carry>` columns from the nearest right row
    * per key ([[graft.plans.AsOf.join]] — the custom
    * [[graft.plans.AsOfJoinExec]] operator, one shuffle per side, no
    * window-over-union materialization). Name resolution happens ONCE
    * at analysis time, like `graft_snapshot`.
    */
  private[graft] val asofTvf: TvfDef =
    (FunctionIdentifier("graft_asof"),
      new ExpressionInfo("graft.plans.AsOf", "graft_asof",
        "graft_asof(leftTable, rightTable, key, tsCol, carryCsv" +
          "[, direction[, toleranceSeconds]]) - native as-of join of " +
          "two registered tables/views; carryCsv is a comma-separated " +
          "right-column list, direction backward|forward"),
      (children: Seq[Expression]) => {
        require(children.length >= 5 && children.length <= 7,
          "graft_asof expects (leftTable, rightTable, key, tsCol, " +
            s"carryCsv[, direction[, toleranceSeconds]]), got " +
            s"${children.length} arguments")
        val fn = "graft_asof"
        val spark = SparkSession.active
        val left = spark.table(litString(children(0), fn, "leftTable"))
        val right = spark.table(litString(children(1), fn, "rightTable"))
        val key = litString(children(2), fn, "key")
        val ts = litString(children(3), fn, "tsCol")
        val carry = litString(children(4), fn, "carryCsv")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(carry.nonEmpty, "graft_asof carryCsv names no columns")
        val dir = children.lift(5)
          .map(litString(_, fn, "direction")).getOrElse("backward")
        val tol = children.lift(6).map(litLong(_, fn, "toleranceSeconds"))
        graft.plans.AsOf.join(left, right, key, ts, carry,
          direction = dir, toleranceSeconds = tol)
          .queryExecution.analyzed
      })

  /** `graft_bm25('indexDir', 'query text'[, topK])` — search a
    * PERSISTED [[graft.extra.Bm25Index]] from SQL: top-K (id, n_hits,
    * score) rows, term-pruned posting reads, never the corpus. The
    * query string tokenizes with the engine's standard whitespace
    * tokenizer.
    */
  private[graft] val bm25Tvf: TvfDef =
    (FunctionIdentifier("graft_bm25"),
      new ExpressionInfo("graft.extra.Bm25Index", "graft_bm25",
        "graft_bm25(indexDir, queryText[, topK]) - BM25 top-K over a " +
          "persisted index; returns (id, n_hits, score)"),
      (children: Seq[Expression]) => {
        require(children.length >= 2 && children.length <= 3,
          s"graft_bm25 expects (indexDir, queryText[, topK]), got " +
            s"${children.length} arguments")
        val fn = "graft_bm25"
        val dir = litString(children(0), fn, "indexDir")
        val terms = litString(children(1), fn, "queryText")
          .toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val topK = children.lift(2).map(litLong(_, fn, "topK").toInt)
          .getOrElse(20)
        graft.extra.Bm25Index.search(SparkSession.active, dir, terms,
          topK = topK).queryExecution.analyzed
      })

  /** `graft_dedup_spans('table', 'idCol', 'textCol'[, k[, minSpan]])` —
    * ExactSubstr span dedup ([[graft.extra.Dedup.removeDupSpans]]) as
    * a TVF over a registered table/view: per input row, the text with
    * duplicated >= k-token runs cut (canonical survivor kept) plus
    * `n_spans_removed` / `n_tokens_removed`.
    */
  private[graft] val dedupSpansTvf: TvfDef =
    (FunctionIdentifier("graft_dedup_spans"),
      new ExpressionInfo("graft.extra.Dedup", "graft_dedup_spans",
        "graft_dedup_spans(table, idCol, textCol[, k[, minSpanTokens]])" +
          " - ExactSubstr span dedup over a registered table/view"),
      (children: Seq[Expression]) => {
        require(children.length >= 3 && children.length <= 5,
          "graft_dedup_spans expects (table, idCol, textCol[, k[, " +
            s"minSpanTokens]]), got ${children.length} arguments")
        val fn = "graft_dedup_spans"
        val spark = SparkSession.active
        val docs = spark.table(litString(children(0), fn, "table"))
        val idCol = litString(children(1), fn, "idCol")
        val textCol = litString(children(2), fn, "textCol")
        val k = children.lift(3).map(litLong(_, fn, "k").toInt)
          .getOrElse(5)
        val minSpan = children.lift(4)
          .map(litLong(_, fn, "minSpanTokens").toInt).getOrElse(0)
        graft.extra.Dedup.removeDupSpans(docs, idCol, textCol, k,
          minSpanTokens = minSpan).queryExecution.analyzed
      })

  /** `graft_ann('indexDir', array(...)[, k[, nprobe]])` — query-by-
    * vector ANN over a persisted IVF-PQ index from SQL: top-k
    * (rank, neighbor_id, cosine, adc_d2) for the LITERAL query
    * embedding (the serving call with a model-produced vector):
    *
    *   SELECT neighbor_id, cosine
    *   FROM graft_ann('/data/ann', array(0.1d, -0.2d, ...), 5)
    */
  private[graft] val annTvf: TvfDef =
    (FunctionIdentifier("graft_ann"),
      new ExpressionInfo("graft.extra.AnnIndex", "graft_ann",
        "graft_ann(indexDir, queryVector[, k[, nprobe]]) - top-k ANN " +
          "over a persisted IVF-PQ index for a literal query vector"),
      (children: Seq[Expression]) => {
        require(children.length >= 2 && children.length <= 4,
          "graft_ann expects (indexDir, queryVector[, k[, nprobe]]), " +
            s"got ${children.length} arguments")
        val fn = "graft_ann"
        val dir = litString(children(0), fn, "indexDir")
        val vecE = children(1)
        require(vecE.foldable, s"$fn queryVector must be a literal array")
        val vec = vecE.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            vecE.dataType match {
              case org.apache.spark.sql.types.ArrayType(et, _) =>
                a.toObjectArray(et).map {
                  case n: Number => n.doubleValue
                  case o => throw new IllegalArgumentException(
                    s"$fn queryVector must be numeric, got $o")
                }
              case t => throw new IllegalArgumentException(
                s"$fn queryVector must be an array literal, got $t")
            }
          case o => throw new IllegalArgumentException(
            s"$fn queryVector must be an array literal, got $o")
        }
        val k = children.lift(2).map(litLong(_, fn, "k").toInt)
          .getOrElse(5)
        val nprobe = children.lift(3)
          .map(litLong(_, fn, "nprobe").toInt).getOrElse(3)
        graft.extra.AnnIndex.searchVectors(SparkSession.active, dir,
            Seq((0L, vec)), k, nprobe)
          .drop("query_id")
          .queryExecution.analyzed
      })

  /** `graft_neardup('indexDir', 'batchTable', idCol, textCol[, thr])`
    * — the persisted-index incremental near-dup verdict
    * ([[graft.extra.MinhashIndex.dedupBatch]]) from SQL: one row per
    * batch-table row with (is_dup, dup_of) against the standing
    * corpus index ∪ batch-mates. Like `graft_asof`, the batch arrives
    * by registered table/view name; resolution (and the operator's
    * bounded planning probes) happens once at analysis time.
    */
  private[graft] val neardupTvf: TvfDef =
    (FunctionIdentifier("graft_neardup"),
      new ExpressionInfo("graft.extra.MinhashIndex", "graft_neardup",
        "graft_neardup(indexDir, batchTable, idCol, textCol" +
          "[, threshold]) - incremental near-dup verdicts against a " +
          "persisted MinHash band index"),
      (children: Seq[Expression]) => {
        require(children.length >= 4 && children.length <= 5,
          "graft_neardup expects (indexDir, batchTable, idCol, " +
            s"textCol[, threshold]), got ${children.length} arguments")
        val fn = "graft_neardup"
        val spark = SparkSession.active
        val dir = litString(children(0), fn, "indexDir")
        val batch = spark.table(litString(children(1), fn, "batchTable"))
        val idCol = litString(children(2), fn, "idCol")
        val textCol = litString(children(3), fn, "textCol")
        val thr = children.lift(4)
          .map(litDouble(_, fn, "threshold")).getOrElse(0.5)
        graft.extra.MinhashIndex.dedupBatch(spark, dir, batch, idCol,
          textCol, thr).queryExecution.analyzed
      })

  /** `graft_dedup_spans_inc('indexDir', 'batchTable', idCol, textCol
    * [, minSpanTokens])` — incremental ExactSubstr span dedup against
    * a persisted gram-posting index
    * ([[graft.extra.SubstrIndex.dedupBatch]]) from SQL.
    */
  private[graft] val substrIncTvf: TvfDef =
    (FunctionIdentifier("graft_dedup_spans_inc"),
      new ExpressionInfo("graft.extra.SubstrIndex",
        "graft_dedup_spans_inc",
        "graft_dedup_spans_inc(indexDir, batchTable, idCol, textCol" +
          "[, minSpanTokens]) - span dedup of a batch against a " +
          "persisted duplicated-gram posting index"),
      (children: Seq[Expression]) => {
        require(children.length >= 4 && children.length <= 5,
          "graft_dedup_spans_inc expects (indexDir, batchTable, " +
            s"idCol, textCol[, minSpanTokens]), got " +
            s"${children.length} arguments")
        val fn = "graft_dedup_spans_inc"
        val spark = SparkSession.active
        val dir = litString(children(0), fn, "indexDir")
        val batch = spark.table(litString(children(1), fn, "batchTable"))
        val idCol = litString(children(2), fn, "idCol")
        val textCol = litString(children(3), fn, "textCol")
        val minSpan = children.lift(4)
          .map(litLong(_, fn, "minSpanTokens").toInt).getOrElse(0)
        graft.extra.SubstrIndex.dedupBatch(spark, dir, batch, idCol,
          textCol, minSpan).queryExecution.analyzed
      })

  /** `graft_semdedup('indexDir', 'batchTable', idCol, vecCol
    * [, threshold])` — incremental SemDeDup verdicts against a
    * persisted IVF-flat semantic index
    * ([[graft.extra.SemanticIndex.dedupBatch]]) from SQL: one row per
    * batch-table row with (cluster_id, is_dup, dup_of, best_cos).
    */
  private[graft] val semdedupTvf: TvfDef =
    (FunctionIdentifier("graft_semdedup"),
      new ExpressionInfo("graft.extra.SemanticIndex", "graft_semdedup",
        "graft_semdedup(indexDir, batchTable, idCol, vecCol" +
          "[, threshold]) - incremental semantic-dedup verdicts " +
          "against a persisted IVF-flat embedding index"),
      (children: Seq[Expression]) => {
        require(children.length >= 4 && children.length <= 5,
          "graft_semdedup expects (indexDir, batchTable, idCol, " +
            s"vecCol[, threshold]), got ${children.length} arguments")
        val fn = "graft_semdedup"
        val spark = SparkSession.active
        val dir = litString(children(0), fn, "indexDir")
        val batch = spark.table(litString(children(1), fn, "batchTable"))
        val idCol = litString(children(2), fn, "idCol")
        val vecCol = litString(children(3), fn, "vecCol")
        val thr = children.lift(4)
          .map(litDouble(_, fn, "threshold")).getOrElse(0.9)
        graft.extra.SemanticIndex.dedupBatch(spark, dir, batch, idCol,
          vecCol, thr).queryExecution.analyzed
      })

  /** `graft_classify('modelDir', 'table', idCol, textCol[, 'scores'])`
    * — classification under a PERSISTED Naive Bayes model
    * ([[graft.extra.Classifier.save]]) from SQL: default mode is one
    * row per document (id, predicted, score); the literal `'scores'`
    * mode returns the per-(doc, class) exact-decimal log-posteriors.
    * The model loads (memoized via its materialize) at analysis time;
    * the scored table arrives by registered view name, the
    * `graft_neardup` contract.
    */
  private[graft] val classifyTvf: TvfDef =
    (FunctionIdentifier("graft_classify"),
      new ExpressionInfo("graft.extra.Classifier", "graft_classify",
        "graft_classify(modelDir, table, idCol, textCol[, mode]) - " +
          "argmax classification (or mode='scores' log-posteriors) " +
          "under a persisted NB model"),
      (children: Seq[Expression]) => {
        require(children.length >= 4 && children.length <= 5,
          "graft_classify expects (modelDir, table, idCol, textCol" +
            s"[, mode]), got ${children.length} arguments")
        val fn = "graft_classify"
        val spark = SparkSession.active
        val dir = litString(children(0), fn, "modelDir")
        val docs = spark.table(litString(children(1), fn, "table"))
        val idCol = litString(children(2), fn, "idCol")
        val textCol = litString(children(3), fn, "textCol")
        val mode = children.lift(4)
          .map(litString(_, fn, "mode")).getOrElse("predict")
        val model = graft.extra.Classifier.load(spark, dir)
        val out = mode match {
          case "predict" =>
            graft.extra.Classifier.predictNaiveBayes(docs, idCol,
              textCol, model)
          case "scores" =>
            graft.extra.Classifier.scoreNaiveBayes(docs, idCol,
              textCol, model)
          case other => throw new IllegalArgumentException(
            s"$fn mode must be 'predict' or 'scores', got '$other'")
        }
        out.queryExecution.analyzed
      })

  /** `graft_bpe_count('modelDir', 'table', idCol, textCol)` — exact
    * subword token counts under a PERSISTED BPE tokenizer
    * ([[graft.extra.BpeModel]]) from SQL: one row per input row with
    * (id, n_tokens, n_bpe_tokens). The merge list loads memoized per
    * head signature; the encode tier (codegen replace chain vs typed
    * merge loop) is selected by the loaded list's size
    * ([[graft.extra.Text.withBpeTokensAuto]]).
    */
  private[graft] val bpeCountTvf: TvfDef =
    (FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo("graft.extra.BpeModel", "graft_bpe_count",
        "graft_bpe_count(modelDir, table, idCol, textCol) - exact " +
          "subword token counts under a persisted BPE merge list"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_bpe_count expects (modelDir, table, idCol, textCol), " +
            s"got ${children.length} arguments")
        val fn = "graft_bpe_count"
        val spark = SparkSession.active
        val dir = litString(children(0), fn, "modelDir")
        val docs = spark.table(litString(children(1), fn, "table"))
        val idCol = litString(children(2), fn, "idCol")
        val textCol = litString(children(3), fn, "textCol")
        graft.extra.BpeModel.tokenCounts(spark, dir, docs, idCol, textCol)
          .queryExecution.analyzed
      })

  /** `graft_perplexity('modelDir', 'table', idCol, textCol)` — KN
    * trigram-LM cross-entropy per row of `table` under a PERSISTED
    * model ([[graft.extra.KnLm]]) from SQL, with the full OOV backoff
    * cascade: (id[, group], n_trigrams, cross_entropy). Rows with < 3
    * tokens drop; a grouped model requires the group column on the
    * table.
    */
  private[graft] val perplexityTvf: TvfDef =
    (FunctionIdentifier("graft_perplexity"),
      new ExpressionInfo("graft.extra.KnLm", "graft_perplexity",
        "graft_perplexity(modelDir, table, idCol, textCol) - KN " +
          "trigram-LM cross-entropy under a persisted model with " +
          "OOV backoff"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_perplexity expects (modelDir, table, idCol, " +
            s"textCol), got ${children.length} arguments")
        val fn = "graft_perplexity"
        val spark = SparkSession.active
        val dir = litString(children(0), fn, "modelDir")
        val docs = spark.table(litString(children(1), fn, "table"))
        val idCol = litString(children(2), fn, "idCol")
        val textCol = litString(children(3), fn, "textCol")
        val model = graft.extra.KnLm.load(spark, dir)
        graft.extra.KnLm.score(docs, idCol, textCol, model)
          .queryExecution.analyzed
      })

  /** Idempotently add the same wiring to a live session. */
  def registerAll(spark: SparkSession): Unit = {
    val (id, info, builder) = dotFunction
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(id))
      reg.registerFunction(id, info, builder)
    val treg = spark.sessionState.tableFunctionRegistry
    Seq(snapshotTvf, snapshotHistoryTvf, asofTvf, bm25Tvf,
      dedupSpansTvf, annTvf, neardupTvf, substrIncTvf,
      semdedupTvf, indexStatsTvf, classifyTvf, bpeCountTvf,
      perplexityTvf).foreach {
      case (tid, tinfo, tbuilder) =>
        if (!treg.functionExists(tid))
          treg.registerFunction(tid, tinfo, tbuilder)
    }
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfStrategy
  }
}
