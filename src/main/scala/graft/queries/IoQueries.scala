package graft.queries

import org.apache.spark.sql.functions._

/** Source/sink round-trip queries (SURVEY S5/K3): the JSONL+seek
  * interchange path under the oracle gate.
  */
object IoQueries {

  /** Round-trip the documents table through JSONL shards, then hash every
    * record that came back. The oracle computes the same hashes over the
    * PARQUET source directly — any loss, reorder-sensitive corruption, or
    * type coercion in the JSONL path breaks the bit-exact compare.
    */
  val q43JsonlRoundtrip = QueryDef(
    "q43_jsonl_roundtrip",
    (s, dir) => {
      val src = s.read.parquet(s"$dir/documents.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
      graft.io.JsonlPages.write(src, tmp)
      graft.io.JsonlPages.read(s, tmp, src.schema)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(to_binary(col("text"), lit("utf-8"))).as("text_md5"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, lang, n_chars, md5(text) AS text_md5
      FROM documents ORDER BY doc_id
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q43JsonlRoundtrip)
}
