package graft

import org.apache.spark.sql.SparkSession

/** Debug runner: execute one named query against a table dir and
  * print its row count (and the error, if any, un-swallowed).
  * Usage: RunOne <queryName> <sfDir>
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[runone] $name rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
