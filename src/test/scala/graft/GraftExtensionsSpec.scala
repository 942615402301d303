package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The spark.sql.extensions deployment hook: SQL-surface access to the
  * custom codegen expressions and planner strategy, idempotent on a
  * live session.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("registerAll exposes graft_dot to spark.sql and injects the " +
      "as-of strategy; double registration is a no-op") {
    GraftExtensions.registerAll(spark)
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), " +
        "array(4.0d, 5.0d, 6.0d)) AS d").head().getDouble(0)
    assert(r == 32.0)
    // folds the shorter length; a null ELEMENT nulls the result (the
    // expression's documented contract)
    assert(spark.sql(
      "SELECT graft_dot(array(1.0d), array(1.0d, 2.0d)) AS d")
      .head().getDouble(0) == 1.0)
    assert(spark.sql(
      "SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), " +
        "array(1.0d, 2.0d)) AS d").head().isNullAt(0))
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.AsOfStrategy) == 1)
    // registry path (expr(...) from the Column API) resolves too
    import org.apache.spark.sql.functions.expr
    val viaExpr = spark.range(1)
      .select(expr("graft_dot(array(2.0d, 2.0d), array(3.0d, 3.0d))"))
      .head().getDouble(0)
    assert(viaExpr == 12.0)
  }

  test("graft_snapshot TVF: SQL time travel over a snapshot table, " +
      "composable in joins; literal-argument contract enforced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("tvfsnap").toString
    graft.extra.Snapshots.init(spark.range(20)
      .select(col("id"), concat(lit("d"), col("id")).as("text")),
      dir, "id", 2)
    graft.extra.Snapshots.upsert(spark,
      dir, Seq((1L, "d1-v2")).toDF("id", "text"), "id")

    assert(spark.sql(s"SELECT count(*) FROM graft_snapshot('$dir')")
      .head().getLong(0) == 20L)
    // explicit version: v0 still serves the original row
    assert(spark.sql(
      s"SELECT text FROM graft_snapshot('$dir', 0) WHERE id = 1")
      .head().getString(0) == "d1")
    assert(spark.sql(
      s"SELECT text FROM graft_snapshot('$dir', 1) WHERE id = 1")
      .head().getString(0) == "d1-v2")
    // composes like any relation: self-join across versions = the
    // SQL spelling of a version diff probe
    val changed = spark.sql(
      s"""SELECT a.id FROM graft_snapshot('$dir', 0) a
         |JOIN graft_snapshot('$dir', 1) b ON a.id = b.id
         |WHERE a.text <> b.text""".stripMargin)
    assert(changed.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // non-literal arguments are rejected at analysis
    intercept[Exception] {
      spark.sql(
        s"SELECT * FROM range(1), LATERAL graft_snapshot('$dir', id)")
        .collect()
    }
  }

  test("the extensions class itself wires a SparkSessionExtensions " +
      "instance without error (spark.sql.extensions contract)") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
