package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from SURVEY §2 (plus the
  * large-scale pipeline extras); `oracleSql` carries the equivalent DuckDB SQL for
  * the driver's correctness gate. Query groups live under [[graft.queries]].
  */
object SparkEntry {

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (_root_.graft.queries.Relational.queries, _root_.graft.queries.Relational.oracleSql),
      (_root_.graft.queries.ErQueries.queries, _root_.graft.queries.ErQueries.oracleSql),
      (_root_.graft.queries.LlmQueries.queries, _root_.graft.queries.LlmQueries.oracleSql),
      (_root_.graft.queries.GraphQueries.queries, _root_.graft.queries.GraphQueries.oracleSql),
      (_root_.graft.queries.MiscQueries.queries, _root_.graft.queries.MiscQueries.oracleSql)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.iterator.map(_._2).reduce(_ ++ _)

  /** Bench-only oracle symmetrization (see [[graft.queries.LlmQueries]]):
    * ordered index-artifact temp-table builds the oracle bench runs
    * UNTIMED, and per-query timed overrides referencing them — so the
    * amortized Spark ANN probes compare against amortized oracle probes.
    * Correctness (`oracleSql`) is unaffected. */
  def oracleSetupSql: Seq[(String, String)] =
    _root_.graft.queries.LlmQueries.oracleSetupSql
  def oracleBenchSql: Map[String, String] =
    _root_.graft.queries.LlmQueries.oracleBenchSql
}
