package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query corpus lives in graft.queries.*; each map entry is one operator
  * line from SURVEY §2, with a DuckDB oracle where SQL-expressible. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship analytic shape: fact->dims join chain +
    * grouped integer-exact aggregation (db_perf Q-A / screen-time). */
  def entry(spark: SparkSession): DataFrame =
    queries("j01_equi_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ IntervalQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries ++
      SourceQueries.queries ++ PhraseQueries.queries ++
      ExtraQueries.queries ++ EsperTvQueries.queries ++
      EsperCatalogQueries.queries ++
      StreamParityQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ IntervalQueries.oracle ++
      TextQueries.oracle ++ SimilarityQueries.oracle ++
      SourceQueries.oracle ++ PhraseQueries.oracle ++
      ExtraQueries.oracle ++ EsperTvQueries.oracle ++
      EsperCatalogQueries.oracle ++
      StreamParityQueries.oracle
}
