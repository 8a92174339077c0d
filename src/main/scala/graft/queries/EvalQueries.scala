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

  /** METEOR, exact stage (X17: metrics.py:36 via nltk.translate.meteor).
    *
    * The greedy alignment is SQL-expressible — per word, the k-th-last
    * hypothesis occurrence pairs with the k-th-last reference occurrence
    * (provably identical to nltk's reversed-greedy scan), and chunks fall
    * out of a lag window over matches ordered by hypothesis position — so
    * this hard metric gets a REAL bit-exact DuckDB oracle. The query runs
    * the exact stage only (stem=false): the full library form with the
    * Porter-stem stage is TextMetrics.meteor (golden-tested; a stemmer
    * cannot be reproduced inside DuckDB SQL).
    */
  val q35Meteor = QueryDef(
    "q35_meteor",
    (s, dir) => {
      import s.implicits._
      val gt = trim(col("text"))
      val pred = regexp_replace(regexp_replace(gt, " \\S+$", ""), "data", "datum")
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), pred.as("pred"), gt.as("gt"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, p, g) =>
          val h = graft.eval.TextMetrics.tokenize(p).map(_.toLowerCase(java.util.Locale.ROOT))
          val r = graft.eval.TextMetrics.tokenize(g).map(_.toLowerCase(java.util.Locale.ROOT))
          val (m, chunks) = graft.eval.TextMetrics.meteorAlignment(h, r, stem = false)
          val score =
            if (m == 0) 0.0
            else {
              val pp = m.toDouble / h.length
              val rr = m.toDouble / r.length
              val frag = chunks.toDouble / m
              (pp * rr) / (0.9 * pp + 0.1 * rr) * (1.0 - 0.5 * (frag * frag * frag))
            }
          (id, m, chunks, score)
        })
        .toDF("doc_id", "matches", "chunks", "meteor")
        .select(col("doc_id"), col("matches"), col("chunks"),
          round(col("meteor"), 6).as("meteor"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH t AS (
        -- list_filter drops the [''] artifact regexp_split yields on
        -- empty input, matching the Spark tokenizer's nonEmpty filter
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '') AS rt,
               list_filter(regexp_split_to_array(lower($predSqlDuck), '\\s+'), x -> x <> '') AS ht
        FROM documents),
      h AS (SELECT doc_id, unnest(ht) AS w, unnest(generate_series(1, len(ht))) AS pos FROM t),
      r AS (SELECT doc_id, unnest(rt) AS w, unnest(generate_series(1, len(rt))) AS pos FROM t),
      hr AS (SELECT doc_id, w, pos, row_number() OVER (PARTITION BY doc_id, w ORDER BY pos DESC) AS rk FROM h),
      rr AS (SELECT doc_id, w, pos, row_number() OVER (PARTITION BY doc_id, w ORDER BY pos DESC) AS rk FROM r),
      mt AS (SELECT hr.doc_id, hr.pos AS hpos, rr.pos AS rpos
             FROM hr JOIN rr ON hr.doc_id = rr.doc_id AND hr.w = rr.w AND hr.rk = rr.rk),
      ch AS (SELECT doc_id,
                    CASE WHEN lag(hpos) OVER w = hpos - 1 AND lag(rpos) OVER w = rpos - 1 THEN 0 ELSE 1 END AS brk
             FROM mt WINDOW w AS (PARTITION BY doc_id ORDER BY hpos)),
      agg AS (SELECT doc_id, COUNT(*) AS m, SUM(brk) AS chunks FROM ch GROUP BY doc_id),
      fin AS (SELECT t.doc_id, len(t.ht) AS hl, len(t.rt) AS rl,
                     coalesce(agg.m, 0) AS m, coalesce(agg.chunks, 0) AS chunks
              FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id)
      SELECT doc_id, CAST(m AS INT) AS matches, CAST(chunks AS INT) AS chunks,
             round(CASE WHEN m = 0 THEN 0.0 ELSE
               ((CAST(m AS DOUBLE)/hl) * (CAST(m AS DOUBLE)/rl)) /
               (0.9 * (CAST(m AS DOUBLE)/hl) + 0.1 * (CAST(m AS DOUBLE)/rl)) *
               (1.0 - 0.5 * ((CAST(chunks AS DOUBLE)/m) * (CAST(chunks AS DOUBLE)/m) * (CAST(chunks AS DOUBLE)/m)))
             END, 6) AS meteor
      FROM fin ORDER BY doc_id
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q27EditDistance, q28TokenPRF, q35Meteor)
}
