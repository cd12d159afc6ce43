package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional third arg: comma-separated subset of query names (local
    // oracle iteration without the full sweep). Unknown names fail
    // loudly — a typo'd subset would otherwise run NOTHING and
    // overwrite oracle_sql.json with '{}'.
    val only = args.drop(2).headOption.map(_.split(',').toSet)
    only.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"Verify: unknown query names ${unknown.mkString(", ")} — " +
          s"valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench: the 100-entry default thrashes across multi-query
      // runs (round-14 — every query re-compiles per sweep)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name -> String.valueOf(e.getMessage)
      }
      // free each query's plan-barrier pins so a 52-query sweep in one
      // JVM doesn't accumulate executor storage (Barrier scaladoc)
      Barrier.release(spark)
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
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // subset runs write to a DISTINCT file: overwriting oracle_sql.json
    // with only the subset's entries would silently drop the oracle SQL
    // for every other query if pointed at the standard verify dir.
    val oracleFile =
      if (only.isDefined) "oracle_sql.partial.json" else "oracle_sql.json"
    Files.writeString(Paths.get(s"$outDir/$oracleFile"), json)
    spark.stop()
    // FAIL-LOUD completeness gate (round-11 verdict #1): a query that
    // threw was previously a stderr line only, so a driver run could
    // ship an (n-1)-entry artifact under an "all green" assumption —
    // the emitted set must equal the selected key set or the run
    // itself fails (after the oracle json + every healthy dump are on
    // disk, so a partial artifact still exists for diagnosis).
    require(failed.isEmpty,
      s"Verify: ${failed.size}/${selected.size} queries FAILED — " +
        failed.map { case (n, m) => s"$n (${m.take(200)})" }.mkString("; "))
  }
}
