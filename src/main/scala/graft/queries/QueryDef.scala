package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract: a Spark
  * query over the test tables plus (when SQL-expressible) an equivalent
  * ANSI SQL oracle for DuckDB. Column names/aliases MUST match between
  * the two (driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  /** Register parquet dirs as temp views named like the bare tables, so
    * query bodies can be written once against table names. DuckDB gets
    * equivalent views from read_parquet (see Verify/driver).
    */
  def loadTables(spark: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }

  /** Spread a SMALL scan across the session's cores before heavy
    * per-row CPU work (extraction, alignment, signature hashing, the
    * external-process pipe). A table that fits one parquet split
    * arrives as ONE task — `maxSplitBytes` never cuts a file below
    * `openCostInBytes` (4 MB) — so every row-local operator downstream
    * runs single-threaded no matter how many cores the session has
    * (optimization guide §2.5 "input skew": one unsplittable input →
    * repartition immediately after the read).
    *
    * Scale-adaptive by construction: when the scan already yields at
    * least the session's default parallelism (any production-size
    * table), this is the identity — zero extra Exchange at scale. The
    * explicit partition count pins the exchange against AQE coalescing
    * (the point is task count for CPU, not shuffle bytes); hashing on
    * the caller's key column is deterministic under task retries
    * (guide §2.5 — never round-robin on nondeterministic input).
    * Callers are per-row maps whose queries end in their own
    * orderBy/aggregate, so row placement cannot change results.
    */
  def fanOut(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, org.apache.spark.sql.functions.col(key))
  }
}
