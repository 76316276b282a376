package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Mining.fpmFpgrowth(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Mining.queries ++
      operators.Relational.queries ++
      functions.Scalar.queries ++
      operators.LlmOps.queries ++
      operators.SqlSurface.queries ++
      streaming.Streaming.queries ++
      functions.Udfs.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Mining.oracle ++
      operators.Relational.oracle ++
      functions.Scalar.oracle ++
      operators.LlmOps.oracle ++
      operators.SqlSurface.oracle ++
      streaming.Streaming.oracle ++
      functions.Udfs.oracle
}
