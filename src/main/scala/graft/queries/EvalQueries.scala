package graft.queries

import org.apache.spark.sql.functions._

/** Evaluation-metric queries (X17/J6: keyed prediction↔truth compare,
  * metrics.py:27-44): built-in `levenshtein` for edit distance and
  * set-based token P/R/F1 as column expressions — both with bit-exact
  * DuckDB oracles. The multiset/BLEU variants live in graft.eval
  * (Scala, golden-tested) since they are not cleanly SQL-expressible.
  */
object EvalQueries {

  /** Deterministic "prediction": ground truth with its last word dropped
    * and one synonym substitution — a fixed, engine-reproducible mutation.
    */
  private val predSqlDuck =
    "regexp_replace(regexp_replace(trim(text), ' \\S+$', ''), 'data', 'datum', 'g')"

  val q27EditDistance = QueryDef(
    "q27_edit_distance",
    (s, dir) => {
      val gt = trim(col("text"))
      val pred = regexp_replace(regexp_replace(gt, " \\S+$", ""), "data", "datum")
      s.read.parquet(s"$dir/documents.parquet")
        .select(
          col("doc_id"),
          levenshtein(pred, gt).as("lev"),
          round(levenshtein(pred, gt).cast("double") /
                greatest(length(pred), length(gt)), 6).as("norm_ed"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, trim(text) AS gt, $predSqlDuck AS pred FROM documents)
      SELECT doc_id, CAST(levenshtein(pred, gt) AS INT) AS lev,
             round(CAST(levenshtein(pred, gt) AS DOUBLE) / greatest(length(pred), length(gt)), 6) AS norm_ed
      FROM t ORDER BY doc_id
    """.trim)
  )

  val q28TokenPRF = QueryDef(
    "q28_token_prf",
    (s, dir) => {
      val gt = trim(col("text"))
      val pred = regexp_replace(regexp_replace(gt, " \\S+$", ""), "data", "datum")
      val pt = array_distinct(split(pred, "\\s+"))
      val gtt = array_distinct(split(gt, "\\s+"))
      val inter = size(array_intersect(pt, gtt))
      val p = inter.cast("double") / size(pt)
      val r = inter.cast("double") / size(gtt)
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), inter.as("inter"),
          round(p, 6).as("precision"), round(r, 6).as("recall"),
          round(when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6).as("f1"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH t AS (SELECT doc_id,
                        list_distinct(regexp_split_to_array($predSqlDuck, '\\s+')) AS pt,
                        list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS gtt
                 FROM documents),
      m AS (SELECT doc_id, len(list_filter(pt, x -> list_contains(gtt, x))) AS inter,
                   len(pt) AS np, len(gtt) AS ng FROM t)
      SELECT doc_id, CAST(inter AS INT) AS inter,
             round(CAST(inter AS DOUBLE) / np, 6) AS precision,
             round(CAST(inter AS DOUBLE) / ng, 6) AS recall,
             round(CASE WHEN CAST(inter AS DOUBLE) / np + CAST(inter AS DOUBLE) / ng > 0
                        THEN 2.0 * (CAST(inter AS DOUBLE) / np) * (CAST(inter AS DOUBLE) / ng) /
                             (CAST(inter AS DOUBLE) / np + CAST(inter AS DOUBLE) / ng)
                        ELSE 0.0 END, 6) AS f1
      FROM m ORDER BY doc_id
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q27EditDistance, q28TokenPRF)
}
