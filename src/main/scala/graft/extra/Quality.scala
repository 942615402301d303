package graft.extra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-level quality operations: snapshot diffing between corpus
  * versions and declarative data-quality checks — the "is this safe to
  * train on / serve from" firewall a pipeline runs between ingest and
  * publication.
  */
object Quality {

  /** Diff two snapshots of a keyed table: one row per key whose status
    * changed — `added` (new only), `removed` (old only), `changed`
    * (present in both, payload hash differs). Unchanged keys are
    * dropped. One full outer equijoin on the key; the payload compare
    * is an md5 over the concatenated payload columns plus an explicit
    * per-column isNull flag (null-safe without a sentinel value that
    * real text could collide with), computed on each side BEFORE the
    * join so only (key, hash) shuffles — at corpus scale the diff moves
    * two narrow columns, never documents.
    *
    * Output: key, `status` ∈ {added, removed, changed}.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    def hashed(df: DataFrame, hc: String) =
      df.select(col(keyCol),
        md5(concat_ws("\u0001",
          payloadCols.flatMap(c => Seq(
            coalesce(col(c).cast("string"), lit("")),
            col(c).isNull.cast("string"))): _*)).as(hc))
    val o = hashed(oldDf, "__oh")
    val n = hashed(newDf, "__nh")
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__oh").isNull, lit("added"))
          .when(col("__nh").isNull, lit("removed"))
          .when(col("__oh") =!= col("__nh"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(keyCol), col("status"))
  }

  /** One declarative data-quality check: a name plus a violation
    * counter. [[checkAll]] unions the counters into a (check,
    * n_violations) report — every single-table check is a sum(CASE)
    * inside ONE scan-level aggregation per frame, and cross-table
    * checks (orphans, duplicate keys) are keyed anti-join/agg counts.
    */
  final case class Check(name: String, violations: DataFrame)

  /** Null / range violations counted in one pass over the frame:
    * `predicates` maps check name → violation condition.
    */
  def rowChecks(df: DataFrame,
      predicates: Seq[(String, org.apache.spark.sql.Column)]): Seq[Check] =
    predicates.map { case (name, pred) =>
      // coalesce: sum() over an EMPTY frame is NULL, not 0 — an empty
      // table has zero violations, and duplicateKeys already reports 0.
      Check(name, df.agg(
        coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as("n")))
    }

  /** Duplicate-key check: rows beyond the first per key. */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String],
      name: String): Check =
    Check(name,
      df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n")))

  /** Referential orphans: child keys with no parent (left anti join). */
  def orphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): Check =
    Check(name,
      child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n")))

  /** Union the checks into one (check, n_violations) report, ordered by
    * check name. Each check body is a 1-row aggregate, so the union is
    * constant-size regardless of input scale.
    */
  def checkAll(checks: Seq[Check]): DataFrame =
    checks.map { c =>
      c.violations.select(lit(c.name).as("check_name"),
        col("n").cast("long").as("n_violations"))
    }.reduce(_.unionByName(_)).orderBy("check_name")

  /** ANALYZE-style column profile: non-null / null / exact-distinct
    * counts per column, ONE scan — all counters ride a single
    * aggregation (Spark expands the multi-distinct into one shuffled
    * pass), then a `stack` unpivot to long format. Exact distincts are
    * the correctness contract; at extreme cardinality the
    * `approx_count_distinct` variant drops in with the same shape.
    *
    * Output: `col_name`, `n_nonnull`, `n_null`, `n_distinct` — one row
    * per profiled column, ordered by column name.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nl_$c"),
        count_distinct(col(c)).as(s"__nd_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __nn_$c, __nl_$c, __nd_$c").mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nonnull, n_null, n_distinct)")
      .orderBy("col_name")
  }
}
