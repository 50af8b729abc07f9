package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{AdvancedQueries, HistoryQueries, ExtrasQueries, AuditQueries, CoreQueries, ExtendedQueries, TrainingQueries, SourceGeoQueries, MlPrepQueries, IndexedQueries, RefinedQueries, ProductionQueries, WebCorpusQueries, AnalyticsQueries, StreamQueries, EvalQueries, PerceptualQueries, WarcQueries, QuerySpec}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every implemented operator query, in registration order. */
  def specs: Seq[QuerySpec] =
    CoreQueries.all ++ ExtendedQueries.all ++ TrainingQueries.all ++
      SourceGeoQueries.all ++ AuditQueries.all ++ AdvancedQueries.all ++ HistoryQueries.all ++ ExtrasQueries.all ++ MlPrepQueries.all ++ IndexedQueries.all ++ RefinedQueries.all ++ ProductionQueries.all ++ WebCorpusQueries.all ++ AnalyticsQueries.all ++ StreamQueries.all ++ EvalQueries.all ++ PerceptualQueries.all ++ WarcQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    specs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
