package graft.queries

import org.apache.spark.sql.functions._

/** Extraction-engine queries (filled in as the graft.html/extract/post
  * modules land). Placeholder flagship until the pipeline is wired.
  */
object ExtractQueries {

  val qxExtract = QueryDef(
    "qx_extract_markdown",
    (s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), length(col("text")).as("n")),
    None
  )

  val all: Seq[QueryDef] = Seq(qxExtract)
}
