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
      // fixed per-input path (not createTempDirectory): repeated Verify/
      // Bench invocations overwrite instead of leaking a dir per run
      val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_jsonl_rt", java.lang.Integer.toHexString(dir.hashCode)).toString
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

  /** Bucketed-table join (S1 at 100 TB): both sides written once with
    * bucketBy on their join key into the session catalog, then joined —
    * Catalyst plans the join with NO Exchange (see BucketedJoinSpec for
    * the plan assertion; at local test scale the optimizer may still
    * pick a broadcast join, which is also shuffle-free). The oracle
    * joins the raw parquet directly, so the bucketed path must be
    * lossless as well as shuffle-free.
    */
  val q47BucketedJoin = QueryDef(
    "q47_bucketed_join",
    (s, dir) => {
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      graft.io.TableIO.ensureBucketDb(s, "graft_bkt",
        java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_bkt_db").toString)
      val docsT = s"graft_bkt.docs_b_$tag"
      val embsT = s"graft_bkt.embs_b_$tag"
      graft.io.TableIO.writeBucketed(
        s.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang", "n_chars"),
        docsT, 8, "doc_id")
      graft.io.TableIO.writeBucketed(
        s.read.parquet(s"$dir/embeddings.parquet"), embsT, 8, "vec_id")
      s.table(docsT)
        .join(s.table(embsT), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(col("embedding")).as("dim"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT d.doc_id, d.lang, d.n_chars, CAST(len(e.embedding) AS INT) AS dim
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      ORDER BY d.doc_id
    """.trim)
  )

  /** External-process connector (SURVEY S7, pdffigures.py:19-71 twin)
    * under the oracle gate: every document pipes through a REAL
    * /bin/cat worker subprocess (base64 line framing, per-doc timeout,
    * restart-on-fault) and the round-tripped text is hashed. The
    * oracle hashes the parquet source directly, and the query emits
    * only ok rows — a single lost, corrupted, or faulted doc breaks
    * the row-count or hash compare. md5 runs over UTF-8 bytes on both
    * engines, so the gate needs no ASCII contract.
    */
  val qxPipeCat = QueryDef(
    "qx_pipe_cat",
    (s, dir) => {
      // fanOut: one worker subprocess per PARTITION — a one-split scan
      // would round-trip every doc through a single /bin/cat serially
      val docs = QueryDef.fanOut(
        s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
        "doc_id")
      graft.io.ExternalProcess.pipe(docs, "doc_id", "text", Seq("/bin/cat"))
        .filter(_.ok)
        .toDF()
        .select(col("doc_id"),
          md5(to_binary(col("out"), lit("utf-8"))).as("text_md5"),
          length(col("out")).as("n_chars_out"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, md5(text) AS text_md5,
             CAST(length(text) AS INT) AS n_chars_out
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** Corpus snapshot DIFF — the ops tool for comparing two corpus
    * versions (what did the last pipeline run add / drop / change?),
    * and the engine's FULL OUTER join coverage. Version B is derived
    * from the documents table deterministically on both engines: docs
    * with id % 13 == 0 are dropped, id % 7 == 0 have their text
    * amended, and 50 fresh ids appear — so the diff exercises all four
    * verdicts (added / removed / changed / same) with provable counts.
    * At scale both sides are bucketed tables on the join key (q47's
    * layout), so the full-outer plan is shuffle-free.
    */
  val q65CorpusDiff = QueryDef(
    "q65_corpus_diff",
    (s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val a = docs.select(col("doc_id"),
        md5(to_binary(col("text"), lit("utf-8"))).as("ha"))
      val bText = when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" [amended v2]"))).otherwise(col("text"))
      val bOld = docs.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"), md5(to_binary(bText, lit("utf-8"))).as("hb"))
      val bNew = s.range(1000000, 1000050).select(col("id").as("doc_id"),
        md5(to_binary(concat(lit("fresh doc "), col("id")), lit("utf-8"))).as("hb"))
      val b = bOld.unionByName(bNew)
      a.join(b, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("ha").isNull, "added")
            .when(col("hb").isNull, "removed")
            .when(col("ha") =!= col("hb"), "changed")
            .otherwise("same").as("status"))
        .orderBy("doc_id")
    },
    Some("""
      WITH a AS (SELECT doc_id, md5(text) AS ha FROM documents),
      b_old AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [amended v2]' ELSE text END) AS hb
        FROM documents WHERE doc_id % 13 <> 0),
      b_new AS (
        SELECT CAST(1000000 + i AS BIGINT) AS doc_id,
               md5('fresh doc ' || (1000000 + i)) AS hb
        FROM (SELECT unnest(generate_series(0, 49)) AS i)),
      b AS (SELECT * FROM b_old UNION ALL SELECT * FROM b_new)
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             CASE WHEN a.ha IS NULL THEN 'added'
                  WHEN b.hb IS NULL THEN 'removed'
                  WHEN a.ha <> b.hb THEN 'changed'
                  ELSE 'same' END AS status
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
      ORDER BY doc_id
    """.trim)
  )

  /** WARC ingest under the oracle gate — the Common Crawl interchange
    * format parsed by graft.io.WarcPages (the source step BEFORE the
    * input table of the north rule exists). The fixture is provable
    * (the r4 arithmetic-oracle trick): per document, a two-record WARC
    * blob is BUILT deterministically inside the query — a `response`
    * record whose block is a fixed 44-byte HTTP envelope plus the text,
    * and a `metadata` record with a length note — with every third blob
    * gzip-compressed on the wire; parsing it back must recover record
    * types, header counts, block lengths, and the envelope-stripped
    * body bit-exactly, all of which DuckDB predicts arithmetically from
    * the original text column (gzip is invisible to the prediction —
    * decompression must be lossless or every third row's hashes break).
    *
    * Scale shape: build+parse is a stateless per-row flatMap — segments
    * map to tasks, no shuffle before the output sort; fault paths
    * (truncation, bad lengths, garbage, corrupt gzip) are fault ROWS
    * pinned by WarcReaderSpec, never task failures.
    */
  val qxWarcScan = QueryDef(
    "qx_warc_scan",
    (s, dir) => {
      import s.implicits._
      import java.nio.charset.StandardCharsets.UTF_8
      import graft.io.WarcPages
      QueryDef.fanOut(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
          .filter(col("text").isNotNull),
        "doc_id")
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          val uri = s"https://crawl.example/d/$id"
          val blob =
            WarcPages.buildResponse(uri, "2024-01-01T00:00:00Z", text.getBytes(UTF_8)) ++
            WarcPages.buildMetadata(uri, s"len=${text.length}")
          val wire = if (id % 3 == 0) WarcPages.gzip(blob) else blob
          WarcPages.parse(wire).map { r =>
            val body =
              if (r.warcType == "response") WarcPages.httpBody(r.body) else r.body
            (id, r.warcType, if (r.ok) 1 else 0, r.headers.size,
              r.body.length.toLong, new String(body, UTF_8))
          }
        })
        .toDF("doc_id", "rec_type", "ok", "n_headers", "block_len", "body")
        .select(col("doc_id"), col("rec_type"), col("ok"), col("n_headers"),
          col("block_len"), length(col("body")).as("body_chars"),
          md5(to_binary(col("body"), lit("utf-8"))).as("body_md5"))
        .orderBy("doc_id", "rec_type")
    },
    Some("""
      WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      resp AS (
        SELECT doc_id, 'response' AS rec_type, CAST(1 AS INT) AS ok,
               CAST(4 AS INT) AS n_headers,
               CAST(44 + len(text) AS BIGINT) AS block_len,
               CAST(len(text) AS INT) AS body_chars,
               md5(text) AS body_md5
        FROM d),
      meta AS (
        SELECT doc_id, 'metadata' AS rec_type, CAST(1 AS INT) AS ok,
               CAST(3 AS INT) AS n_headers,
               CAST(4 + len(CAST(len(text) AS VARCHAR)) AS BIGINT) AS block_len,
               CAST(4 + len(CAST(len(text) AS VARCHAR)) AS INT) AS body_chars,
               md5('len=' || len(text)) AS body_md5
        FROM d)
      SELECT * FROM resp UNION ALL SELECT * FROM meta
      ORDER BY doc_id, rec_type
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q43JsonlRoundtrip, q47BucketedJoin, qxPipeCat,
    q65CorpusDiff, qxWarcScan)
}
