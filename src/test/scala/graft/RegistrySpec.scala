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

  // Driver-hash conformance: the driver's hasher and DuckDB disagree on
  // DECIMAL canonicalization, so every oracle-paired query casts to
  // DOUBLE on both sides. A decimal-typed serving column is a latent
  // red hash row even with correct values (r12 cdc_view_stream) —
  // pinned here so it fails `sbt test`, not the driver's gate.
  test("no registered query serves a DECIMAL-typed output column") {
    import org.apache.spark.sql.types._
    def hasDecimal(dt: DataType): Boolean = dt match {
      case _: DecimalType => true
      case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType => hasDecimal(a.elementType)
      case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _ => false
    }
    Registry.all.foreach { q =>
      val bad = q.run(spark, sfDir).schema.fields
        .filter(f => hasDecimal(f.dataType))
      assert(bad.isEmpty, s"${q.name} serves DECIMAL column(s) " +
        s"${bad.map(_.name).mkString(", ")} — cast to DOUBLE")
    }
  }

  // Hermetic caches: the per-algorithm version token is part of the
  // cached-artifact path, so bumping the token when building code
  // changes makes every stale dir structurally unreachable.
  test("cachedDir embeds the code-version token in the path") {
    import graft.queries.IndexedCorpus
    val fp = 0x5eedL
    val d1 = IndexedCorpus.cachedDir("graft_testver", 1, fp)(_.mkdirs())
    val d2 = IndexedCorpus.cachedDir("graft_testver", 2, fp)(_.mkdirs())
    try {
      assert(d1 != d2)
      assert(d1.contains("_v1_") && d2.contains("_v2_"))
    } finally Seq(d1, d2).foreach { p =>
      val dir = new java.io.File(p)
      dir.listFiles().foreach(_.delete()); dir.delete(): Unit
    }
  }
}
