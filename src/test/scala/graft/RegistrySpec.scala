package graft

import graft.queries.Registry

/** Smoke: every registered query runs on sf0.001 and returns rows;
  * every oracle key corresponds to a query; entry() is non-empty.
  */
class RegistrySpec extends SparkSpec {
  test("all queries run and return rows on sf0.001") {
    Registry.all.foreach { q =>
      val n = q.run(spark, sfDir).count()
      assert(n > 0, s"query ${q.name} returned no rows")
    }
  }
  test("oracle keys are a subset of query names") {
    val names = Registry.queries.keySet
    assert(Registry.oracleSql.keySet.subsetOf(names))
  }
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("query names are unique") {
    val ns = Registry.all.map(_.name)
    assert(ns.distinct.size == ns.size)
  }
}
