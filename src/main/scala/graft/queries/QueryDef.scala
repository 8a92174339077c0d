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
}
