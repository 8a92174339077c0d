package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Enforces the documents-table contract that two oracle constructions
  * assume but (before r5) only documented:
  *
  *  - `qx_extract_spans` (ExtractQueries.scala) predicts the math-span
  *    start as `len(normalized_text) + 1` where normalization is modeled
  *    as trim + multi-space collapse ONLY, and compares Java UTF-16
  *    offsets against DuckDB codepoint offsets. Both hold iff the text is
  *    ASCII, space-only whitespace, and non-empty after trim.
  *  - `qx_media_features` (MultiModal.scala) sums UTF-8 payload BYTES on
  *    the Spark side but per-character codepoints on the DuckDB side —
  *    identical iff 1 byte per char, i.e. ASCII.
  *
  * If the driver's generator ever widens the documents corpus (tabs,
  * unicode, empty rows), this spec fails by name instead of the oracle
  * hash silently diverging.
  */
class TestDataContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  for (sf <- Seq("sf0.001", "sf0.01")) {
    val path = s"/root/testdata/$sf/documents.parquet"
    test(s"documents[$sf]: non-empty, space-only whitespace, pure ASCII") {
      val bad = spark.read.parquet(path)
        .select(col("doc_id"), col("text"))
        .where(
          col("text").isNull ||
            length(trim(col("text"))) === 0 ||          // span start 0 breaks the +1 oracle
            col("text").rlike("[\\t\\n\\r\\u000b\\f]") || // non-space ws breaks ' {2,}' model
            col("text").rlike("[^\\x00-\\x7f]")          // non-ASCII breaks bytes-vs-codepoints
        )
      val offenders = bad.limit(5).collect()
      assert(offenders.isEmpty,
        s"documents contract violated at $sf: ${offenders.mkString("; ")}")
    }
  }
}
