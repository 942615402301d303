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

  test("the extensions class itself wires a SparkSessionExtensions " +
      "instance without error (spark.sql.extensions contract)") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
