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

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val IpPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrub — the C4/CCNet-style redaction pass every published
    * web-corpus pipeline runs before training: emails, phone numbers
    * and IPv4 addresses replaced by typed sentinels. Deterministic PII
    * is injected into every document inside the query on BOTH engines
    * (the synthetic corpus carries none), so the oracle gates the
    * redaction chain itself: per-class match counts taken before the
    * scrub plus the md5 of the scrubbed text. Patterns use only the
    * regex intersection of Java (Spark) and RE2 (DuckDB) — character
    * classes, bounded repetition, ASCII \b — no lookaround, which RE2
    * lacks. Replacement order is email → phone → IP so the email's
    * host dots can never be re-matched as an address fragment.
    *
    * Scale shape: map-only over the corpus scan — three codegen'd
    * regexp_replace + two regexp_extract_all per row, no shuffle, no
    * UDF; the ungated-regex-scan hazard the extraction pipeline
    * documents does not apply because every row is expected to match.
    */
  val q56PiiScrub = QueryDef(
    "q56_pii_scrub",
    (s, dir) => {
      val aug = concat(
        col("text"),
        lit(" reach user"), col("doc_id").cast("string"),
        lit("@mail"), (col("doc_id") % 7).cast("string"),
        lit(".example.org from 10."), (col("doc_id") % 200).cast("string"),
        lit("."), (col("doc_id") % 251).cast("string"),
        lit(".9 call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" done"))
      val scrubbed =
        regexp_replace(
          regexp_replace(
            regexp_replace(aug, EmailPat, "<EMAIL>"),
            PhonePat, "<PHONE>"),
          IpPat, "<IP>")
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          size(regexp_extract_all(aug, lit(EmailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all(aug, lit(PhonePat), lit(0))).as("n_phones"),
          md5(to_binary(scrubbed, lit("utf-8"))).as("scrub_md5"))
        .orderBy("doc_id")
    },
    Some("""
      WITH aug AS (
        SELECT doc_id,
               text || ' reach user' || doc_id || '@mail' || (doc_id % 7)
               || '.example.org from 10.' || (doc_id % 200) || '.' || (doc_id % 251)
               || '.9 call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' done' AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
             md5(regexp_replace(
                   regexp_replace(
                     regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS scrub_md5
      FROM aug ORDER BY doc_id
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q34TemplateScrub, q56PiiScrub)
}
