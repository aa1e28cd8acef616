package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (SURVEY §2, one entry per
  * operator); `oracleSql` holds the DuckDB-equivalent ANSI SQL for every
  * SQL-expressible query. Column names and row order are aligned between
  * the two on purpose — the driver hash-compares values after sorting
  * columns by name.
  */
object SparkEntry {
  private val groups = Seq(
    ops.Relational.queries,
    ops.Aggregates.queries,
    ops.Windows.queries,
    ops.Scalars.queries,
    ops.TextVector.queries,
    ops.Streaming.queries,
    sources.Sources.queries,
    ops.Extraction.queries,
    ops.Multimodal.queries,
    ops.Composite.queries,
    ops.Tpch.queries,
    ops.Quality.queries,
    ops.Curation.queries,
  )
  private val oracles = Seq(
    ops.Relational.oracle,
    ops.Aggregates.oracle,
    ops.Windows.oracle,
    ops.Scalars.oracle,
    ops.TextVector.oracle,
    ops.Streaming.oracle,
    sources.Sources.oracle,
    ops.Extraction.oracle,
    ops.Multimodal.oracle,
    ops.Composite.oracle,
    ops.Tpch.oracle,
    ops.Quality.oracle,
    ops.Curation.oracle,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggregates.a1_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    oracles.reduce(_ ++ _)
}
