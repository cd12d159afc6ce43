package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Query implementations live in graft.queries.*; this object only
  * aggregates them.
  */
object SparkEntry {
  import graft.queries.{AnnQueries, DedupQueries, DocQueries, MultimodalQueries, QueryUtil, RelationalQueries, TextQueries, VectorQueries}

  private val modules: Seq[(Map[String, QueryUtil.Q], Map[String, String])] = Seq(
    (RelationalQueries.defs, RelationalQueries.oracles),
    (VectorQueries.defs, VectorQueries.oracles),
    (DedupQueries.defs, DedupQueries.oracles),
    (TextQueries.defs, TextQueries.oracles),
    (AnnQueries.defs, AnnQueries.oracles),
    (DocQueries.defs, DocQueries.oracles),
    (MultimodalQueries.defs, MultimodalQueries.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("v_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
