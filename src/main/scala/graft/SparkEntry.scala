package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * DataFrame job over a scale-factor dir; `oracleSql` holds the DuckDB
  * SQL the driver hash-compares each query against. Column aliases match
  * on both sides by construction.
  */
object SparkEntry {

  /** Flagship: the sync-core diff operator (INSERT/UPDATE/DELETE
    * classification via full-outer PK join) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_table_diff")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.RelationalQueries2.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.ExtensionQueries.queries ++
      graft.queries.TypedQueries.queries ++
      graft.queries.CurateQueries.queries ++
      graft.queries.RankingQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.AuditQueries.queries ++
      graft.queries.FrontierQueries.queries ++
      graft.queries.Frontier2Queries.queries

  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracle ++
      graft.queries.RelationalQueries2.oracle ++
      graft.queries.EventQueries.oracle ++
      graft.queries.ExtensionQueries.oracle ++
      graft.queries.TypedQueries.oracle ++
      graft.queries.CurateQueries.oracle ++
      graft.queries.RankingQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.AnalyticsQueries.oracle ++
      graft.queries.CorpusQueries.oracle ++
      graft.queries.AuditQueries.oracle ++
      graft.queries.FrontierQueries.oracle ++
      graft.queries.Frontier2Queries.oracle
}
