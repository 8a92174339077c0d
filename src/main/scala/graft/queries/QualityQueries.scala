package graft.queries

import org.apache.spark.sql.functions._

/** Corpus-quality operators from the public training-data-pipeline
  * literature (C4, Raffel et al. 2020; Gopher, Rae et al. 2021 —
  * rule-based document filtering and repetition statistics), expressed
  * over the `documents` table with bit-exact DuckDB oracles.
  *
  * Scale shapes: all three tokenize in ONE typed pass per row via
  * `TextOps.tokensScala` (the SQL tokenizer's Scala twin) — per
  * CLAUDE.md, higher-order-function lambdas are interpreted with no
  * CSE, so a columnar version would re-run the regex split per
  * consumer. q44 is map-only (no shuffle); q45 is map-only per doc;
  * q46 feeds a partial→final hash aggregate with a
  * TakeOrderedAndProject top-k — no global sort, one shuffle.
  */
object QualityQueries {

  private val pLetter = java.util.regex.Pattern.compile("\\p{L}")

  /** Codepoint count — Spark's and DuckDB's `length`, not UTF-16 units. */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Gopher-style rule filter: per-document quality flags and the final
    * keep decision — mean word length in [3,10], alphabetic-token
    * fraction > 0.8, at least one English stopword, at least 10 tokens.
    */
  val q44GopherRules = QueryDef(
    "q44_gopher_rules",
    (s, dir) => {
      import s.implicits._
      val stop = TextOps.stopEn.toSet
      val counted = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, tx) =>
          if (tx == null) (id, None, None, None, None, None)
          else {
            val toks = TextOps.tokensScala(tx)
            var nAlpha = 0; var nStop = 0; var maxW = 0; var chars = 0
            var i = 0
            while (i < toks.length) {
              val w = toks(i)
              if (pLetter.matcher(w).find()) nAlpha += 1
              if (stop.contains(w)) nStop += 1
              val wl = cpLen(w)
              if (wl > maxW) maxW = wl
              chars += wl // chars_ns: every non-ws char is in exactly one token
              i += 1
            }
            (id, Some(toks.length), Some(nAlpha), Some(nStop), Some(maxW), Some(chars))
          }
        })
        .toDF("doc_id", "n_tokens", "n_alpha", "n_stop", "max_wlen", "chars_ns")
      val meanW = col("chars_ns").cast("double") / col("n_tokens")
      val fracA = col("n_alpha").cast("double") / col("n_tokens")
      counted.select(
          col("doc_id"), col("n_tokens"), col("n_alpha"), col("n_stop"), col("max_wlen"),
          round(meanW, 6).as("mean_wlen"),
          round(fracA, 6).as("frac_alpha"),
          ((meanW >= 3.0) && (meanW <= 10.0) && (fracA > 0.8) &&
            (col("n_stop") >= 1) && (col("n_tokens") >= 10)).cast("int").as("keep"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
               CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS chars_ns
        FROM documents),
      v AS (
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(list_filter(toks, w -> regexp_matches(w, '\p{L}'))) AS INT) AS n_alpha,
               CAST(len(list_filter(toks, w -> w IN ('the','a','of','and'))) AS INT) AS n_stop,
               CAST(list_max(list_transform(toks, w -> length(w))) AS INT) AS max_wlen,
               chars_ns
        FROM t)
      SELECT doc_id, n_tokens, n_alpha, n_stop, max_wlen,
             round(chars_ns / n_tokens, 6) AS mean_wlen,
             round(CAST(n_alpha AS DOUBLE) / n_tokens, 6) AS frac_alpha,
             CAST((chars_ns / n_tokens >= 3.0) AND (chars_ns / n_tokens <= 10.0)
                  AND (CAST(n_alpha AS DOUBLE) / n_tokens > 0.8)
                  AND n_stop >= 1 AND n_tokens >= 10 AS INT) AS keep
      FROM v ORDER BY doc_id
    """.trim)
  )

  /** Repeated-trigram fraction (Gopher's duplicated-n-gram repetition
    * signal): 1 − distinct/total over word 3-grams, per document.
    */
  val q45NgramRepetition = QueryDef(
    "q45_ngram_repetition",
    (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, tx) =>
          if (tx == null) (id, None, None) // NULL text → NULL stats (oracle parity)
          else {
            val toks = TextOps.tokensScala(tx)
            val grams =
              if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toArray
              else Array.empty[String]
            (id, Some(grams.length), Some(grams.distinct.length))
          }
        })
        .toDF("doc_id", "n_grams", "n_distinct")
        .select(
          col("doc_id"), col("n_grams"), col("n_distinct"),
          when(col("n_grams") === 0, lit(0.0))
            .otherwise(round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))
            .as("rep_frac"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      g AS (
        SELECT doc_id,
               list_transform(range(1, len(toks) - 1),
                              i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS grams
        FROM t)
      SELECT doc_id,
             CAST(len(grams) AS INT) AS n_grams,
             CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
             CASE WHEN len(grams) = 0 THEN 0.0
                  ELSE round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
             END AS rep_frac
      FROM g ORDER BY doc_id
    """.trim)
  )

  /** Corpus-level top-k bigram vocabulary (tokenizer/vocab statistics):
    * count every word bigram across the corpus, deterministic total
    * order (count desc, gram asc), top 20.
    */
  val q46TopBigrams = QueryDef(
    "q46_top_bigrams",
    (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("text")).as[String]
        .mapPartitions(_.flatMap { tx =>
          if (tx == null) Iterator.empty // NULL text yields no grams (oracle parity)
          else {
            val toks = TextOps.tokensScala(tx)
            if (toks.length < 2) Iterator.empty
            else toks.sliding(2).map(_.mkString(" "))
          }
        })
        .toDF("gram")
        .groupBy("gram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("gram").asc)
        .limit(20)
    },
    Some("""
      WITH t AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      g AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                                     i -> concat_ws(' ', toks[i], toks[i+1]))) AS gram
        FROM t)
      SELECT gram, count(*) AS cnt FROM g
      GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20
    """.trim)
  )

  /** Corpus length-distribution profile — the percentile/sketch family
    * (every corpus report leads with per-language length quantiles;
    * Gopher table A1, C4 §2). EXACT linear-interpolated quantiles
    * (SQL PERCENTILE_CONT semantics, rank (n-1)·p — the same
    * definition Spark `percentile` and DuckDB `quantile_cont` share)
    * per language, oracle-gated; rounded to 4 dp so engine-private
    * last-ulp interpolation noise cannot break the hash compare while
    * any real quantile error still does. The 100 TB path is the
    * MERGEABLE-SKETCH twin of this query — approx_percentile (KLL-ish
    * bounded-memory, single pass) and approx_count_distinct (HLL++) —
    * whose accuracy against these exact values is pinned by
    * SketchAccuracySpec rather than an oracle (sketch internals are
    * engine-specific by design, so cross-engine bit-equality is the
    * wrong gate for them).
    */
  val q58LenQuantiles = QueryDef(
    "q58_len_quantiles",
    (s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_len"),
          round(percentile(col("n_chars"), lit(0.5)), 4).as("p50_len"),
          round(percentile(col("n_chars"), lit(0.9)), 4).as("p90_len"),
          max(col("n_chars")).as("max_len"))
        .orderBy("lang"),
    Some("""
      SELECT lang, count(*) AS n_docs,
             min(n_chars) AS min_len,
             round(quantile_cont(n_chars, 0.5), 4) AS p50_len,
             round(quantile_cont(n_chars, 0.9), 4) AS p90_len,
             max(n_chars) AS max_len
      FROM documents GROUP BY lang ORDER BY lang
    """.trim)
  )

  /** Deterministic content-keyed sampling + train/val/test splitting.
    * Production corpus splits must be REPRODUCIBLE (a re-run of the
    * pipeline cannot reshuffle examples between train and test) and
    * LEAKAGE-PROOF (two byte-identical documents must never straddle
    * the split boundary). Seeded RNG sampling gives neither — the
    * assignment here is keyed on the content fingerprint (q16's
    * position-weighted engine-agnostic hash), so identical texts land
    * in identical splits by construction, and the whole operator is a
    * stateless map over the scan: no shuffle, no seed, no driver
    * state, embarrassingly scalable. The 10% sample decision uses a
    * different modulus over an affine re-mix of the fingerprint so it
    * is not a residue-slice of the split decision (decisions from one
    * hash must re-mix or they correlate).
    */
  val q59SplitSample = QueryDef(
    "q59_split_sample",
    (s, dir) => {
      import s.implicits._
      // fingerprint computed ONCE in a typed map (TextOps Scala twins of
      // the q16 column arithmetic): the column form would re-embed the
      // interpreted tokenize+fold HOF into all three consumers (two
      // when-branches + the sample mix) — the CollapseProject/no-CSE
      // hazard CLAUDE.md documents. Null text propagates as null fp,
      // exactly like the SQL chain.
      val fp = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).as[(Long, Option[String])]
        .mapPartitions(_.map { case (id, t) =>
          (id, t.map(TextOps.positionalFpScala))
        })
        .toDF("doc_id", "fp")
      val bucket = pmod(col("fp"), lit(100L))
      fp.select(col("doc_id"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"),
          (pmod(col("fp") * 31L + 7L, lit(997L)) < 100L).cast("int").as("in_sample"))
        .orderBy("doc_id")
    },
    Some("""
      WITH f AS (
        SELECT doc_id,
               CAST(CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
                    (w, i) -> i * (length(w) * 31 + ascii(substring(w, 1, 1))))) AS BIGINT)
                    % 1000000007 AS BIGINT) AS fp
        FROM documents)
      SELECT doc_id,
             CASE WHEN fp % 100 < 80 THEN 'train'
                  WHEN fp % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(CASE WHEN (fp * 31 + 7) % 997 < 100 THEN 1 ELSE 0 END AS INT) AS in_sample
      FROM f ORDER BY doc_id
    """.trim)
  )

  /** Corpus MIXTURE assembly — per-source downsampling rates (the
    * Pile/Dolma mixing step: each source contributes a configured
    * fraction of its documents to the training mix). Rates here derive
    * arithmetically from the source id ((idx mod 4 + 1)/4 → 25/50/75/
    * 100%) so the fixture works at every sf; selection within a source
    * is content-keyed (lowest q16 fingerprint first, doc_id
    * tie-break) — the same reproducibility/leakage argument as q59,
    * and re-running with a larger corpus keeps previously selected
    * documents selected unless the quota shrinks.
    *
    * Scale shape: one shuffle on source for the per-source rank
    * window. A dominant source makes that window's sort the straggler;
    * the 100 TB variant replaces exact ranking with a fingerprint
    * THRESHOLD per source (quota/n_s quantile of fp, from the q58
    * sketch) — a map-only filter with approximately-exact quotas. The
    * exact-rank form is the oracle-checkable contract.
    */
  val q60Mixture = QueryDef(
    "q60_mixture",
    (s, dir) => {
      val t = TextOps.tokens(col("text"))
      val terms = transform(t, (w, i) => (i.cast("long") + 1L) * TextOps.wordFeature(w))
      val fp = pmod(aggregate(terms, lit(0L), (acc, x) => acc + x), lit(1000000007L))
      val srcIdx = substring(col("source"), 4, 10).cast("long")
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), fp.as("fp"),
          (pmod(srcIdx, lit(4L)) + 1L).as("rate4"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("fp"), col("doc_id"))
      val n = org.apache.spark.sql.expressions.Window.partitionBy("source")
      docs
        .withColumn("rn", row_number().over(w))
        .withColumn("quota", floor(count(lit(1)).over(n) * col("rate4") / 4L))
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("source"), col("rn").cast("long").as("rn"))
        .orderBy("doc_id")
    },
    Some("""
      WITH f AS (
        SELECT doc_id, source,
               CAST(CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
                    (w, i) -> i * (length(w) * 31 + ascii(substring(w, 1, 1))))) AS BIGINT)
                    % 1000000007 AS BIGINT) AS fp,
               (CAST(substring(source, 4) AS BIGINT) % 4) + 1 AS rate4
        FROM documents),
      r AS (
        SELECT doc_id, source, rate4,
               row_number() OVER (PARTITION BY source ORDER BY fp, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n_src
        FROM f)
      SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
      FROM r WHERE rn <= (n_src * rate4) // 4
      ORDER BY doc_id
    """.trim)
  )

  /** Sequence PACKING — the step that turns a document corpus into
    * fixed-budget training examples: documents are concatenated until
    * the token budget (256 here — small enough that the test corpus genuinely overflows examples) is exhausted, then the next example
    * starts (greedy contiguous packing, the standard pretraining
    * shape). A single global packing order is a 100 TB smell (one
    * total-order sort), so packing runs WITHIN 64 content-keyed
    * buckets: each bucket packs independently (examples never cross
    * buckets — example_id = bucket·2^32 + seq), which is exactly how a
    * 1000-executor job lays out shards. Order within a bucket is
    * (fingerprint, doc_id) — content-keyed, so packing is reproducible
    * and independent of arrival order. Documents longer than the
    * budget occupy ⌈n/256⌉ consecutive examples (their offset math
    * still assigns the STARTING example; splitting the text itself is
    * the tokenizer's job downstream).
    */
  val q64SeqPack = QueryDef(
    "q64_seq_pack",
    (s, dir) => {
      import s.implicits._
      // NULL-text docs are excluded on BOTH sides (a NULL has no tokens
      // to pack; fabricating a zero-token row would diverge from the
      // SQL NULL chain — the q64 r5-review finding)
      val enriched = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, t) =>
          val toks = TextOps.tokensScala(t)
          val fp = TextOps.positionalFpOfTokens(toks)
          (id, toks.length.toLong, fp, fp % 64L)
        })
        .toDF("doc_id", "n_tokens", "fp", "bucket")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy("fp", "doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      enriched
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("bucket"), col("n_tokens"),
          expr("bucket * 4294967296L + (cum - n_tokens) div 256L").as("example_id"),
          expr("(cum - n_tokens) % 256L").as("offset_in_example"))
        .orderBy("doc_id")
    },
    Some("""
      WITH f AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST(CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
                    (w, i) -> i * (length(w) * 31 + ascii(substring(w, 1, 1))))) AS BIGINT)
                    % 1000000007 AS BIGINT) AS fp
        FROM documents WHERE text IS NOT NULL),
      b AS (SELECT doc_id, n_tokens, fp, fp % 64 AS bucket FROM f),
      c AS (SELECT doc_id, bucket, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY bucket ORDER BY fp, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM b)
      SELECT doc_id, bucket, n_tokens,
             CAST(bucket * 4294967296 + (cum - n_tokens) // 256 AS BIGINT) AS example_id,
             CAST((cum - n_tokens) % 256 AS BIGINT) AS offset_in_example
      FROM c ORDER BY doc_id
    """.trim)
  )

  /** BM25 lexical retrieval — the keyword-search counterpart to the ANN
    * family (a corpus engine needs both): Okapi BM25 with k1=1.2,
    * b=0.75 over a fixed 3-term query, top-20 by score. Term
    * frequencies and document length come from ONE typed tokenize pass
    * per doc; the corpus statistics (N, avgdl, per-term df) are a
    * 1-row aggregate broadcast-cross-joined back, so the plan is scan →
    * map → tiny agg → broadcast → score projection → top-k — no wide
    * shuffle of term postings (the 100 TB inverted-index variant
    * materializes postings once via q47's bucketed layout; this is the
    * scan-scoring form used for ad-hoc audits). Double arithmetic is
    * written in the IDENTICAL expression order on both engines and the
    * score rounds to 6 dp so libm last-ulp ln() differences cannot
    * break the hash compare; ties at the same rounded score break by
    * doc_id.
    */
  val q66Bm25 = QueryDef(
    "q66_bm25",
    (s, dir) => {
      import s.implicits._
      val terms = Seq("hash", "join", "filter")
      val perDoc = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, tx) =>
          val toks = TextOps.tokensScala(tx)
          var t0 = 0L; var t1 = 0L; var t2 = 0L
          var i = 0
          while (i < toks.length) {
            val w = toks(i)
            if (w == "hash") t0 += 1
            else if (w == "join") t1 += 1
            else if (w == "filter") t2 += 1
            i += 1
          }
          (id, toks.length.toLong, t0, t1, t2)
        })
        .toDF("doc_id", "dl", "tf0", "tf1", "tf2")
        // persist barrier: the stats aggregate AND the scoring branch
        // both consume perDoc — without it the corpus is scanned and
        // tokenized twice (the q32 InMemoryTableScan-reuse pattern;
        // Bench clears the cache between queries)
        .persist()
      val stats = perDoc.agg(
        count(lit(1)).as("n"),
        sum(col("dl")).as("sumdl"),
        sum((col("tf0") > 0).cast("long")).as("df0"),
        sum((col("tf1") > 0).cast("long")).as("df1"),
        sum((col("tf2") > 0).cast("long")).as("df2"))
      def contrib(tf: String, df: String) = {
        val idf = log(
          (col("n").cast("double") - col(df) + 0.5) / (col(df) + 0.5) + 1.0)
        val dlNorm = lit(1.2) * (lit(1.0) - lit(0.75) +
          lit(0.75) * col("dl").cast("double") / (col("sumdl").cast("double") / col("n")))
        idf * (col(tf).cast("double") * 2.2) / (col(tf).cast("double") + dlNorm)
      }
      perDoc.crossJoin(broadcast(stats))
        .select(col("doc_id"),
          round(contrib("tf0", "df0") + contrib("tf1", "df1") + contrib("tf2", "df2"), 6)
            .as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    },
    Some("""
      WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      pd AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS dl,
               CAST(len(list_filter(toks, w -> w = 'hash')) AS BIGINT) AS tf0,
               CAST(len(list_filter(toks, w -> w = 'join')) AS BIGINT) AS tf1,
               CAST(len(list_filter(toks, w -> w = 'filter')) AS BIGINT) AS tf2
        FROM d),
      st AS (
        SELECT count(*) AS n, sum(dl) AS sumdl,
               sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
               sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
               sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        FROM pd)
      SELECT doc_id,
             round(
               ln((CAST(n AS DOUBLE) - df0 + 0.5) / (df0 + 0.5) + 1.0)
                 * (CAST(tf0 AS DOUBLE) * 2.2)
                 / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n)))
               + ln((CAST(n AS DOUBLE) - df1 + 0.5) / (df1 + 0.5) + 1.0)
                 * (CAST(tf1 AS DOUBLE) * 2.2)
                 / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n)))
               + ln((CAST(n AS DOUBLE) - df2 + 0.5) / (df2 + 0.5) + 1.0)
                 * (CAST(tf2 AS DOUBLE) * 2.2)
                 / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n))),
               6) AS score
      FROM pd, st
      ORDER BY score DESC, doc_id ASC LIMIT 20
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q44GopherRules, q45NgramRepetition, q46TopBigrams,
    q58LenQuantiles, q59SplitSample, q60Mixture, q64SeqPack, q66Bm25)
}
