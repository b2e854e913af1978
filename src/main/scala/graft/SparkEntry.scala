package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate every operator family's map; the
  * driver runs each query at sf0.01 and hash-compares against DuckDB
  * executing the oracle SQL over the same parquet tables.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesRelational.queries("join_5way_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesText.queries ++ QueriesEvents.queries ++
      QueriesSimilarity.queries ++ QueriesAdvanced.queries ++ QueriesBreadth.queries ++
      QueriesTpch.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesRelational.oracleSql ++ QueriesText.oracleSql ++ QueriesEvents.oracleSql ++
      QueriesSimilarity.oracleSql ++ QueriesAdvanced.oracleSql ++ QueriesBreadth.oracleSql ++
      QueriesTpch.oracleSql
}
