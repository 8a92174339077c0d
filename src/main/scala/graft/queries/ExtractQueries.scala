package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{ExtractedDoc, PageRow}
import graft.extract.{Extractor, Outlinks}
import graft.gen.SyntheticCorpus

/** Extraction-engine queries — the north-rule pipeline exposed through
  * the driver contract.
  *
  * `qx_extract_plain` carries a REAL DuckDB oracle: wrapping the
  * documents table's text in boilerplated HTML and extracting must give
  * back exactly the (whitespace-normalized) text — an independent-engine
  * check of the tokenizer → DOM → block-classifier → serializer chain.
  * The richer queries exercise the full surface (math/table/figure/
  * footnote spans, repetition postprocess) and are covered by the
  * byte-golden ScalaTest suite instead of SQL.
  */
object ExtractQueries {

  /** Synthetic corpus sizing per test-data scale factor. */
  def corpusSize(dir: String): Long =
    if (dir.contains("sf0.1")) 30000L
    else if (dir.contains("sf0.01")) 3000L
    else 300L

  /** Deterministic boilerplated wrap of a plain text (no markup chars in
    * the documents corpus, so extraction must return the text verbatim).
    */
  val wrapPrefix: String =
    "<html><head><title>t</title><script>var a=1;</script></head><body>" +
      "<nav class=\"navbar\"><a href=\"/home\">home</a> <a href=\"/about\">about</a> <a href=\"/x\">more</a></nav>" +
      "<div class=\"cookie-banner\">We use cookies. <a href=\"/ok\">Accept</a></div>" +
      "<article><p>"
  val wrapSuffix: String =
    "</p></article>" +
      "<footer><p>Copyright 2024. All rights reserved.</p></footer>" +
      "</body></html>"

  def wrapHtml(text: String): String = wrapPrefix + text + wrapSuffix

  val qxExtractPlain = QueryDef(
    "qx_extract_plain",
    (s, dir) => {
      import s.implicits._
      // fanOut: the whole table is one parquet split — without it the
      // full HTML-extraction map runs on ONE core (guide §2.5)
      QueryDef.fanOut(
        s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text")),
        "doc_id")
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          (id, Extractor.extractHtml(id.toString, wrapHtml(text)).markdown)
        })
        .toDF("doc_id", "markdown")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, regexp_replace(trim(text), ' {2,}', ' ', 'g') AS markdown
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** DuckDB-visible materialization of the synthetic-corpus extraction.
    *
    * DuckDB cannot replay `SyntheticCorpus.generate` + `Extractor.run`,
    * so the oracle for the corpus queries is a SECOND, independent
    * extraction pass written to a fixed parquet path at a deliberately
    * different parallelism (7 generator partitions vs the session
    * default): the live query side re-extracts fresh and must match the
    * materialized pass bit-exactly through DuckDB's own aggregation —
    * i.e. the oracle gates cross-parallelism determinism (the north
    * rule's byte-identical invariant) plus the aggregation arithmetic,
    * engine-agnostically. Rewritten on every Verify JVM (memo below is
    * per-process), so the driver's DuckDB run always reads the parquet
    * produced seconds earlier from the same sf dir.
    */
  val oracleCachePath = "/tmp/graft_verify_extract_cache"
  @volatile private var cachedKey: String = ""
  def materializeExtract(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    synchronized {
      // key on dir AND size: two fixture dirs sharing the fallback size
      // must not reuse each other's materialized oracle parquet
      val key = s"$dir|${corpusSize(dir)}"
      if (cachedKey != key) {
        import s.implicits._
        SyntheticCorpus.generate(s, corpusSize(dir), partitions = 7)
          .mapPartitions(Extractor.run(_))
          .select(col("url"), col("ok"), col("markdown"),
                  col("blocks_kept"), col("blocks_dropped"),
                  size(col("spans")).as("n_spans"))
          .coalesce(1)
          .write.mode("overwrite").parquet(oracleCachePath)
        cachedKey = key
      }
    }

  /** Full pipeline over the synthetic Common-Crawl-style corpus
    * (BASELINE.json input_hint shape), aggregated per page family.
    * Oracle: DuckDB aggregates the independently materialized extraction
    * pass (see [[materializeExtract]]) — bit-exact or the extractor is
    * nondeterministic across parallelism.
    */
  val qxExtractCorpus = QueryDef(
    "qx_extract_corpus",
    (s, dir) => {
      import s.implicits._
      materializeExtract(s, dir)
      SyntheticCorpus.generate(s, corpusSize(dir))
        .mapPartitions(Extractor.run(_))
        .withColumn("family", split(col("url"), "/").getItem(3))
        .groupBy("family")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("ok"), 1).otherwise(0)).as("n_ok"),
          sum(col("blocks_kept")).as("blocks_kept"),
          sum(col("blocks_dropped")).as("blocks_dropped"),
          sum(size(col("spans"))).as("n_spans"),
          sum(length(col("markdown"))).as("md_chars")
        )
        .orderBy("family")
    },
    Some(s"""
      SELECT split_part(url, '/', 4) AS family,
             count(*) AS n_docs,
             CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
             CAST(sum(blocks_kept) AS BIGINT) AS blocks_kept,
             CAST(sum(blocks_dropped) AS BIGINT) AS blocks_dropped,
             CAST(sum(n_spans) AS BIGINT) AS n_spans,
             CAST(sum(len(markdown)) AS BIGINT) AS md_chars
      FROM read_parquet('$oracleCachePath/*.parquet')
      GROUP BY 1 ORDER BY family
    """.trim)
  )

  /** Span detail with offsets (north-rule unit), under the oracle gate:
    * each document's text is wrapped with a doc-derived inline math
    * element, so the extracted markdown is the normalized text plus one
    * deterministic `\(x_{id}=1\)` span whose (start, end) offsets are
    * pure arithmetic over the normalized text length — DuckDB predicts
    * the whole span row, so tokenizer, math normalization, serializer
    * spacing, and offset bookkeeping are all gated bit-exactly.
    * (Offsets are Java UTF-16 units vs DuckDB codepoints — identical
    * here because the corpus is ASCII; the extraction ingest's
    * control-char strip keeps it in that contract.) The generator-
    * corpus span stream this replaced stays exercised through
    * qx_extract_corpus's span aggregates and the byte-golden suite.
    */
  val qxExtractSpans = QueryDef(
    "qx_extract_spans",
    (s, dir) => {
      import s.implicits._
      QueryDef.fanOut(
        s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text")),
        "doc_id")
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val html = wrapPrefix + text +
            s" <math alttext=\"x_{$id}=1\"></math>" + wrapSuffix
          (id, Extractor.extractHtml(id.toString, html))
        })
        .flatMap { case (id, d) =>
          d.spans.map(sp => (id, sp.kind, sp.id, sp.start, sp.end))
        }
        .toDF("doc_id", "kind", "id", "start", "end")
        .orderBy("doc_id", "start")
    },
    Some("""
      WITH n AS (SELECT doc_id,
                        regexp_replace(trim(text), ' {2,}', ' ', 'g') AS nt
                 FROM documents)
      SELECT doc_id, 'math_inline' AS kind, 'eq-1' AS id,
             CAST(len(nt) + 1 AS INT) AS start,
             CAST(len(nt) + 11 + len(CAST(doc_id AS VARCHAR)) AS INT) AS "end"
      FROM n ORDER BY doc_id, start
    """.trim)
  )

  /** Per-document markdown fingerprints over the synthetic corpus — the
    * determinism witness (same values at any parallelism). Oracle: DuckDB
    * computes md5/len over the independently materialized pass (7-way
    * generation) — every url's markdown must hash identically.
    */
  val qxExtractHashes = QueryDef(
    "qx_extract_hashes",
    (s, dir) => {
      import s.implicits._
      materializeExtract(s, dir)
      SyntheticCorpus.generate(s, corpusSize(dir))
        .mapPartitions(Extractor.run(_))
        .select(col("url"), col("ok"), md5(to_binary(col("markdown"), lit("utf-8"))).as("md_hash"),
                length(col("markdown")).as("md_len"))
        .orderBy("url")
    },
    Some(s"""
      SELECT url, ok, md5(markdown) AS md_hash,
             CAST(len(markdown) AS INT) AS md_len
      FROM read_parquet('$oracleCachePath/*.parquet')
      ORDER BY url
    """.trim)
  )

  /** The same byte-exact oracle as qx_extract_plain, but through the
    * NATIVE Catalyst expression (`extract_markdown`) registered on the
    * session — the custom-Expression path proven against DuckDB.
    */
  val qxSqlExtractExpr = QueryDef(
    "qx_sql_extract_expr",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      s.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("docs_for_expr")
      s.sql(
        s"""SELECT doc_id,
           |  extract_markdown(to_binary(concat('${wrapPrefix}', text, '${wrapSuffix}'), 'utf-8')) AS markdown
           |FROM docs_for_expr ORDER BY doc_id""".stripMargin)
    },
    Some("""
      SELECT doc_id, regexp_replace(trim(text), ' {2,}', ' ', 'g') AS markdown
      FROM documents ORDER BY doc_id
    """.trim)
  )

  val qxExtract = qxExtractCorpus

  /** Outlink-stream materialization, same contract as
    * [[materializeExtract]]: an independent 7-partition generation +
    * DOM-walk pass written once per (dir, size) so DuckDB can aggregate
    * the SAME link stream the live query recomputes at session
    * parallelism — the oracle gates that the anchor walk is
    * deterministic across parallelism, then that both engines aggregate
    * it identically.
    */
  val outlinksCachePath = "/tmp/graft_verify_outlinks_cache"
  @volatile private var outlinksKey: String = ""
  def materializeOutlinks(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    synchronized {
      val key = s"$dir|${corpusSize(dir)}"
      if (outlinksKey != key) {
        import s.implicits._
        SyntheticCorpus.generate(s, corpusSize(dir), partitions = 7)
          .mapPartitions(_.flatMap { r =>
            Outlinks.extract(r.html).map(l => (r.url, l.href, l.anchor))
          })
          .toDF("url", "href", "anchor")
          .coalesce(1)
          .write.mode("overwrite").parquet(outlinksCachePath)
        outlinksKey = key
      }
    }

  /** Outlink/anchor-text channel over the synthetic corpus (the link
    * stream the markdown path's boilerplate removal deliberately
    * drops): per-target in-link counts, distinct linking pages, and
    * anchor-text volume — the ingest shape for host/page authority
    * ranks (q63's consumer) and anchor-text corpora.
    *
    * Scale shape: one corpus scan, flatMap (no state), one shuffle on
    * the href key with map-side combine; anchors never leave the
    * executor un-aggregated. At 100 TB the href key space is hosts ×
    * paths — heavily skewed toward chrome links, which is exactly the
    * salting case q48 demonstrates; here the aggregate is associative
    * so the partial combine already absorbs the skew. The one
    * EXACT-form cost is `count(distinct url)`: it adds a second
    * Exchange on (href, url) (BENCH/PLANS.md). That is the
    * oracle-checkable contract; the 100 TB choice is the
    * `approx_count_distinct` twin — HLL++ partials merge map-side, so
    * the rollup collapses back to ONE Exchange — pinned against this
    * exact form by the error envelope + plan assertion in
    * OutlinksSketchSpec (the q58/SketchAccuracySpec pattern).
    */
  val qxOutlinks = QueryDef(
    "qx_outlinks",
    (s, dir) => {
      import s.implicits._
      materializeOutlinks(s, dir)
      SyntheticCorpus.generate(s, corpusSize(dir))
        .mapPartitions(_.flatMap { r =>
          Outlinks.extract(r.html).map(l => (r.url, l.href, l.anchor))
        })
        .toDF("url", "href", "anchor")
        .groupBy("href")
        .agg(
          count(lit(1)).as("n_links"),
          countDistinct(col("url")).as("n_pages"),
          sum(length(col("anchor"))).as("anchor_chars"),
          // numeric anchor digest instead of min(anchor): a string min
          // forces SortAggregate (immutable agg buffer) through the
          // whole rollup; the first-char-code sum keeps every stage in
          // HashAggregate while still pinning anchor CONTENT, not just
          // lengths, in the oracle hash
          sum(when(length(col("anchor")) > 0,
            ascii(substring(col("anchor"), 1, 1))).otherwise(0)
            .cast("long")).as("anchor_head_sum"))
        .orderBy("href")
    },
    Some(s"""
      SELECT href,
             count(*) AS n_links,
             count(DISTINCT url) AS n_pages,
             CAST(sum(len(anchor)) AS BIGINT) AS anchor_chars,
             CAST(sum(CASE WHEN len(anchor) > 0
                           THEN ascii(substring(anchor, 1, 1)) ELSE 0 END) AS BIGINT)
               AS anchor_head_sum
      FROM read_parquet('$outlinksCachePath/*.parquet')
      GROUP BY href ORDER BY href
    """.trim)
  )

  /** One full CorpusJob run per (dir, size) per JVM: the real
    * extract→scrub→dedup→split composition into a keyed /tmp workdir
    * (distinct sf dirs run disjoint jobs — the r5-advice clobber note;
    * the DuckDB-facing cache below must stay a CONSTANT path because
    * oracle SQL is static, so last-writer-wins there is inherent to the
    * materialize pattern). The job's scrub table is flattened to the
    * cache path so DuckDB can replay the assembly stage from the same
    * input the Scala assembly consumed.
    */
  val corpusScrubCachePath = "/tmp/graft_verify_corpus_scrub_cache"
  @volatile private var corpusKey: String = ""
  @volatile private var corpusWork: String = ""
  def materializeCorpusRun(s: org.apache.spark.sql.SparkSession, dir: String): String =
    synchronized {
      val n = corpusSize(dir)
      val key = s"$dir|$n"
      if (corpusKey != key) {
        val work = s"/tmp/graft_verify_corpus_${Integer.toHexString(key.hashCode)}"
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(work), true)
        graft.pipeline.CorpusJob.run(s, s"synthetic:$n", work)
        graft.io.TableIO.readData(s, s"$work/scrub")
          .getOrElse(sys.error(s"CorpusJob left no scrub table under $work"))
          .select(col("url"), col("host"), col("markdown"))
          .coalesce(1)
          .write.mode("overwrite").parquet(corpusScrubCachePath)
        corpusWork = work
        corpusKey = key
      }
      corpusWork
    }

  /** End-to-end corpus assembly under the oracle gate (the r5-verdict
    * composition item): the LIVE side runs the production CorpusJob —
    * ExtractJob → ScrubJob → exact dedup (min-url per markdown md5) →
    * quality gate (≥10 tokens) → content-fingerprint split — and
    * aggregates the published corpus table per split; DuckDB replays
    * the dedup→gate→split assembly INDEPENDENTLY from the job's scrub
    * table and must reproduce per-split cardinalities, token totals,
    * fingerprint sums, markdown character mass, and the url extrema
    * bit-exactly. The shared extract+scrub prefix is itself gated by
    * qx_extract_plain/hashes and q34; this row gates the composition.
    *
    * Scale shape is CorpusJob's (one dedup shuffle, map-side gate and
    * split, one layout shuffle); the aggregation here is a 3-group
    * rollup with map-side combine over the final table.
    */
  val qxCorpusAssemble = QueryDef(
    "qx_corpus_assemble",
    (s, dir) => {
      val work = materializeCorpusRun(s, dir)
      graft.io.TableIO.readData(s, s"$work/corpus")
        .getOrElse(sys.error(s"CorpusJob left no corpus table under $work"))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tok_sum"),
          sum(col("fp")).as("fp_sum"),
          sum(length(col("markdown"))).as("md_chars"),
          min(col("url")).as("url_min"),
          max(col("url")).as("url_max"))
        .orderBy("split")
    },
    Some(s"""
      WITH t AS (
        SELECT url, markdown,
               CAST(CAST(coalesce(list_sum(list_transform(
                      regexp_split_to_array(trim(markdown), '\\s+'),
                      (w, i) -> i * (length(w) * 31 + ascii(substring(w, 1, 1))))), 0) AS BIGINT)
                    % 1000000007 AS BIGINT) AS fp,
               len(regexp_split_to_array(trim(markdown), '\\s+')) AS n_toks
        FROM read_parquet('$corpusScrubCachePath/*.parquet')),
      d AS (
        SELECT *, row_number() OVER (PARTITION BY md5(markdown) ORDER BY url) AS rn FROM t),
      kept AS (
        SELECT url, markdown, fp, n_toks FROM d WHERE rn = 1 AND n_toks >= 10)
      SELECT CASE WHEN fp % 100 < 80 THEN 'train'
                  WHEN fp % 100 < 90 THEN 'val' ELSE 'test' END AS split,
             count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS tok_sum,
             CAST(sum(fp) AS BIGINT) AS fp_sum,
             CAST(sum(len(markdown)) AS BIGINT) AS md_chars,
             min(url) AS url_min,
             max(url) AS url_max
      FROM kept GROUP BY 1 ORDER BY split
    """.trim)
  )

  /** Charset-sniffed ingest under the oracle gate (CharsetSniff, the
    * decode step the extractor now runs on raw crawl bytes). Provable
    * fixture: per document the wire bytes are BUILT inside the query in
    * one of four deterministic shapes — UTF-8 with BOM plus a two-byte
    * é, invalid UTF-8 whose 0xE9/0x97 bytes are windows-1252 é and em
    * dash, a `<meta charset="iso-8859-1">` declaration (which WHATWG
    * aliases to windows-1252) ahead of a high byte, and plain ASCII —
    * and DuckDB predicts the decoded text of every shape with chr()
    * arithmetic, so the BOM consumption, the fallback, the alias rule,
    * and the hot sniff path are all hash-gated cross-engine.
    *
    * Scale shape: stateless per-row map; the decode itself is the
    * extraction ingest (one intrinsic decode + one scan on the valid-
    * UTF-8 hot path, per CharsetSniff's gate discipline).
    */
  val qxCharsetDecode = QueryDef(
    "qx_charset_decode",
    (s, dir) => {
      import s.implicits._
      import java.nio.charset.StandardCharsets.UTF_8
      val Bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
      val Meta = "<meta charset=\"iso-8859-1\">"
      QueryDef.fanOut(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
          .filter(col("text").isNotNull),
        "doc_id")
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val bytes = (id % 4) match {
            case 0 => Bom ++ text.getBytes(UTF_8) ++ " ".getBytes(UTF_8) ++
              Array(0xC3.toByte, 0xA9.toByte)
            case 1 => text.getBytes(UTF_8) ++ Array(0xE9.toByte, 0x97.toByte)
            case 2 => Meta.getBytes(UTF_8) ++ text.getBytes(UTF_8) :+ 0xE9.toByte
            case _ => text.getBytes(UTF_8)
          }
          val d = graft.extract.CharsetSniff.decode(bytes)
          (id, d.charset, d.text)
        })
        .toDF("doc_id", "charset", "dec")
        .select(col("doc_id"), col("charset"),
          length(col("dec")).as("n_chars"),
          md5(to_binary(col("dec"), lit("utf-8"))).as("dec_md5"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      p AS (
        SELECT doc_id,
               CASE CAST(doc_id % 4 AS INT)
                 WHEN 0 THEN 'utf-8-bom'
                 WHEN 1 THEN 'windows-1252'
                 WHEN 2 THEN 'windows-1252'
                 ELSE 'utf-8' END AS charset,
               CASE CAST(doc_id % 4 AS INT)
                 WHEN 0 THEN text || ' ' || chr(233)
                 WHEN 1 THEN text || chr(233) || chr(8212)
                 WHEN 2 THEN '<meta charset="iso-8859-1">' || text || chr(233)
                 ELSE text END AS dec
        FROM d)
      SELECT doc_id, charset, CAST(len(dec) AS INT) AS n_chars, md5(dec) AS dec_md5
      FROM p ORDER BY doc_id
    """.trim)
  )

  /** END-TO-END crawl ingest — the full production path from wire bytes
    * to markdown in ONE oracle-gated composition: WARC record (every
    * third blob gzipped) → HTTP envelope strip → charset-sniffed decode
    * (odd docs are windows-1252-encoded on the wire, so their é byte is
    * invalid UTF-8 and must take the fallback; even docs are UTF-8) →
    * boilerplate-wrapped extraction. DuckDB predicts the final markdown
    * STRING itself (the qx_extract_plain normalization plus the chr(233)
    * marker), so a regression anywhere in the four-stage chain breaks
    * the hash. The stages are each gated alone (qx_warc_scan,
    * qx_charset_decode, qx_extract_plain); this row gates their seams.
    *
    * Scale shape: a stateless per-row map over the scan — the exact
    * shape a 1000-executor crawl ingest runs, segments to tasks, no
    * shuffle before the output sort.
    */
  val qxCrawlIngest = QueryDef(
    "qx_crawl_ingest",
    (s, dir) => {
      import s.implicits._
      import java.nio.charset.StandardCharsets.UTF_8
      import graft.io.WarcPages
      // fanOut: WARC build+parse+gunzip+sniff+extract per row over a
      // one-split scan — the heaviest single-threaded map in the suite
      QueryDef.fanOut(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
          .filter(col("text").isNotNull),
        "doc_id")
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val page = wrapHtml(text + " Café.")
          // string-name overload: a captured Charset is not serializable
          val pageBytes =
            if (id % 2 == 1) page.getBytes("windows-1252") else page.getBytes(UTF_8)
          val wire0 = WarcPages.buildResponse(
            s"https://crawl.example/d/$id", "2024-01-01T00:00:00Z", pageBytes)
          val wire = if (id % 3 == 0) WarcPages.gzip(wire0) else wire0
          val rec = WarcPages.parse(wire).head
          val html = WarcPages.httpBody(rec.body)
          val dec = graft.extract.CharsetSniff.decode(html)
          val doc = graft.extract.Extractor.extract(id.toString, html)
          (id, dec.charset, if (rec.ok && doc.ok) 1 else 0, doc.markdown)
        })
        .toDF("doc_id", "charset", "ok", "markdown")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 1 THEN 'windows-1252' ELSE 'utf-8' END AS charset,
             CAST(1 AS INT) AS ok,
             regexp_replace(trim(text), ' {2,}', ' ', 'g') || ' Caf' || chr(233) || '.' AS markdown
      FROM documents WHERE text IS NOT NULL ORDER BY doc_id
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(
    qxExtractPlain, qxExtractCorpus, qxExtractSpans, qxExtractHashes, qxSqlExtractExpr,
    qxOutlinks, qxCorpusAssemble, qxCharsetDecode, qxCrawlIngest)
}
