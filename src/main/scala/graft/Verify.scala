package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (builder-side iteration only; the driver always
    // calls with two): comma-separated query names to dump, e.g.
    //   runMain graft.Verify /root/testdata/sf0.001 /tmp/v cube_daily
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // see Bench: the 100-entry default thrashes on a 175-query run
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "16384"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Driver-hash conformance guard: the driver's hasher does not
    // canonicalize DECIMAL the way DuckDB emits it, so the repo-wide
    // convention is CAST(... AS DOUBLE) on both sides of every oracle.
    // A decimal-typed output column is therefore a latent red hash row
    // even when every value matches (r12's cdc_view_stream) — catch it
    // at build time, not in the driver's gate.
    import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType,
      MapType, StructType}
    def hasDecimal(dt: DataType): Boolean = dt match {
      case _: DecimalType => true
      case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType => hasDecimal(a.elementType)
      case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _ => false
    }
    val decimalViolations = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = df.schema.fields.filter(f => hasDecimal(f.dataType))
        if (bad.nonEmpty) {
          decimalViolations += s"$name: ${bad.map(_.name).mkString(",")}"
          throw new IllegalStateException(
            s"output columns ${bad.map(_.name).mkString(", ")} are " +
              "DECIMAL-typed — cast to DOUBLE in the serving " +
              "projection AND the oracle (driver-hash convention)")
        }
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (decimalViolations.nonEmpty) {
      System.err.println(
        "[verify] FATAL: DECIMAL-typed output columns (cast to DOUBLE " +
          "per the driver-hash convention):\n  " +
          decimalViolations.mkString("\n  "))
      sys.exit(2)
    }
  }
}
