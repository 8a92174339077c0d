package graft.queries

import org.apache.spark.sql.functions._

/** Corpus-level quality operators: cross-page template scrub (A1's real
  * semantics — reference split_md_to_pages.py:176-236 scrubs words on
  * ≥40% of pages; re-rooted at hosts for the web corpus).
  */
object CorpusQueries {

  /** Deterministic multi-line corpus built from `documents` inside the
    * query (the synthetic docs are single-line): every page of a host
    * gets the same footer (ratio 1.0 → scrubbed), even pages share a
    * promo line (0.5 ≥ 0.4 → scrubbed), every-third pages share a rare
    * line (~0.33 < 0.4 → KEPT: the threshold is load-bearing), and each
    * page has a unique line (kept). Both engines do the same injection,
    * so the oracle checks the scrub itself, not the fixture.
    */
  val q34TemplateScrub = QueryDef(
    "q34_template_scrub",
    (s, dir) => {
      val aug = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"),
          concat(
            col("text"),
            lit("\n(c) 2024 "), col("source"), lit(" all rights reserved"),
            when(col("doc_id") % 2 === 0,
              concat(lit("\npromo "), col("source"))).otherwise(lit("")),
            when(col("doc_id") % 3 === 0,
              concat(lit("\nrare "), col("source"))).otherwise(lit("")),
            lit("\ndoc "), col("doc_id"), lit(" unique")
          ).as("t"))
      graft.corpus.TemplateScrub.scrub(aug, "source", "doc_id", "t")
        .select(col("id").as("doc_id"), col("n_kept"),
          length(col("cleaned")).as("clean_len"),
          md5(to_binary(col("cleaned"), lit("utf-8"))).as("clean_md5"))
        .orderBy("doc_id")
    },
    Some("""
      WITH aug AS (
        SELECT doc_id, source,
               text
               || chr(10) || '(c) 2024 ' || source || ' all rights reserved'
               || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'promo ' || source ELSE '' END
               || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'rare ' || source ELSE '' END
               || chr(10) || 'doc ' || doc_id || ' unique' AS t
        FROM documents),
      ls AS (SELECT doc_id, source, string_split(t, chr(10)) AS parts FROM aug),
      lines AS (SELECT doc_id, source,
                       unnest(generate_series(1, len(parts))) AS pos,
                       unnest(parts) AS line
                FROM ls),
      pages AS (SELECT source, count(DISTINCT doc_id) AS n_pages FROM aug GROUP BY source),
      freq AS (SELECT source, trim(line) AS norm, count(DISTINCT doc_id) AS n_on
               FROM lines WHERE length(trim(line)) > 0
               GROUP BY source, trim(line)),
      boiler AS (SELECT f.source, f.norm
                 FROM freq f JOIN pages p ON f.source = p.source
                 WHERE f.n_on >= 2 AND CAST(f.n_on AS DOUBLE) / p.n_pages >= 0.4),
      kept AS (SELECT l.doc_id, l.pos, l.line
               FROM lines l
               WHERE NOT EXISTS (SELECT 1 FROM boiler b
                                 WHERE b.source = l.source AND b.norm = trim(l.line))),
      out AS (SELECT doc_id, count(*) AS n_kept,
                     string_agg(line, chr(10) ORDER BY pos) AS cleaned
              FROM kept GROUP BY doc_id)
      -- a fully-templated doc must survive as an empty row (the Spark
      -- side re-adds it via left join), not vanish from the output
      SELECT a.doc_id,
             coalesce(o.n_kept, 0) AS n_kept,
             CAST(length(coalesce(o.cleaned, '')) AS INT) AS clean_len,
             md5(coalesce(o.cleaned, '')) AS clean_md5
      FROM aug a LEFT JOIN out o ON a.doc_id = o.doc_id
      ORDER BY a.doc_id
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q34TemplateScrub)
}
