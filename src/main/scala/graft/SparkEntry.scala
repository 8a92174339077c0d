package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-family packs under graft.queries;
  * each pack entry carries its own DuckDB oracle SQL when the operator is
  * SQL-expressible (extraction-engine ops get rows-only checks plus the
  * byte-golden ScalaTest suite).
  */
object SparkEntry {
  import graft.queries._

  private lazy val defs: Seq[QueryDef] =
    Relational.all ++ TextOps.all ++ Dedup.all ++ Similarity.all ++
      MultiModal.all ++ EvalQueries.all ++ ExtractQueries.all ++ CorpusQueries.all ++
      AlignQueries.all ++ IoQueries.all ++ QualityQueries.all ++ Skew.all ++
      GraphQueries.all ++ WebQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full HTML → markdown extraction over synthesized pages.
    */
  def entry(spark: SparkSession): DataFrame =
    ExtractQueries.qxExtract.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
