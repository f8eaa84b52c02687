package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module operator inventories; each key
  * has a DuckDB oracle in `oracleSql` unless the op is not
  * SQL-expressible (driver then records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The minimum end-to-end slice (SURVEY §7): catalog-bound
    * read -> transform -> group aggregate through the engine. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.queries.Star.table(spark, "/root/testdata/sf0.001", "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.queries.Star.sumDec($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.LlmQueries.oracleSql
}
