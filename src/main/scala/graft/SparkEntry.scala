package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY §2 has a `queries` entry; every
  * SQL-expressible one also has an `oracleSql` entry (DuckDB dialect) so the
  * driver can hash-compare the two result sets. Column names/aliases are kept
  * identical on both sides (the compare sorts columns by name), every query
  * has a deterministic ORDER BY on both sides, and double aggregates are
  * rounded identically so FP summation order can't flip the hash.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Tables.configure(spark)
    cdr.CdrQueries.queries("cdr_pipeline_full")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.RelQueries.queries ++
      cdr.CdrQueries.queries ++
      llm.LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relational.RelQueries.oracle ++
      cdr.CdrQueries.oracle ++
      llm.LlmQueries.oracle
}
