package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{ExtraQueries, IterativeQueries, PipelineQueries, RelationalQueries, SourceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from three groups:
  *  - [[graft.queries.RelationalQueries]] — the classic MR example
  *    surface (SURVEY §2.2 A14) + framework operator recipes.
  *  - [[graft.queries.IterativeQueries]] — the iterative/incremental
  *    algorithms (A1-A5) with exact unrolled-SQL oracles.
  *  - [[graft.queries.PipelineQueries]] — dedup/similarity/text/
  *    multimodal training-data-pipeline operators.
  */
object SparkEntry {
  private val defs =
    RelationalQueries.all ++ IterativeQueries.all ++ PipelineQueries.all ++
      ExtraQueries.all ++ SourceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * iterative PageRank (the reference's own flagship, A1). */
  def entry(spark: SparkSession): DataFrame =
    defs.find(_.name == "q_pagerank").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
}
