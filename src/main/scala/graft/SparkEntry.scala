package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from the per-domain modules:
  *  - relational: TPC-H-ish operator coverage (joins/aggs/windows/setops)
  *  - search: the wikisearch engine surface (index build + JEXL-subset
  *    boolean queries) run end-to-end over the `documents` table
  *  - pipeline: LLM-data ops (dedup, similarity, text analysis, multimodal)
  */
object SparkEntry {

  lazy val registry: Seq[NamedQuery] =
    relational.RelationalQueries.all ++
      search.SearchQueries.all ++
      pipeline.PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the whole engine: documents → index build → parse → plan →
    * index semi-joins → residual filter.
    */
  def entry(spark: SparkSession): DataFrame =
    search.SearchQueries
      .engine(spark, "/root/testdata/sf0.001")
      .run("TEXT == 'spark' and (TEXT == 'join' or TEXT == 'vector')")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every op is oracled — the hash-based ones
    * use deliberately portable integer hashes the SQL re-derives, and
    * `sim_ivf_topk` persists its trained centroids per run so the SQL
    * re-derives serving (assignment, probes, exact rerank) from them.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
