package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus URL/domain analytics — the crawl-side operators a
  * training-data pipeline runs before any text processing: URL parsing,
  * per-host rollups, and domain blocklist filtering (every production
  * web corpus — C4, RefinedWeb, FineWeb — drops blocklisted domains
  * first, since it is the cheapest filter and removes whole subtrees of
  * the crawl).
  */
object WebQueries {

  /** Deterministic per-doc URL synthesized inside the query on both
    * engines (q63 fixture pattern — the documents table has no url
    * column): host carries a quadratic doc_id residue so hosts have
    * skewed page counts, and lang becomes the TLD so the host space is
    * (residue × lang). The query then PARSES the url string back
    * (split on '/', numeric-part regexp in the shared Java∩RE2
    * dialect) — the parse path is what production runs on real urls.
    *
    * Blocklist semantics: hosts whose numeric part ≡ 0 (mod 5) form a
    * derived blocklist RELATION, removed with a left-anti join. At
    * scale the blocklist (10^5-ish domains) is broadcast, so the
    * corpus never shuffles for the filter; the per-host rollup is one
    * map-side-combinable aggregation.
    */
  val q68HostStats = QueryDef(
    "q68_host_stats",
    (s, dir) => {
      val urls = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          concat(lit("https://h"),
            pmod(col("doc_id") * col("doc_id"), lit(37L)).cast("string"),
            lit(".example."), col("lang"),
            lit("/"), col("source"),
            lit("/"), col("doc_id").cast("string")).as("url"))
        .withColumn("host", split(col("url"), "/").getItem(2))
        .withColumn("hostnum",
          regexp_extract(col("host"), "h([0-9]+)", 1).cast("long"))
      val blocked = urls.select(col("host"), col("hostnum")).distinct()
        .filter(col("hostnum") % 5 === 0)
        .select("host")
      urls.join(broadcast(blocked), Seq("host"), "left_anti")
        .groupBy("host")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("host")
    },
    Some("""
      WITH urls AS (
        SELECT doc_id, lang, source, n_chars,
               'https://h' || ((doc_id * doc_id) % 37) || '.example.' || lang
                 || '/' || source || '/' || doc_id AS url
        FROM documents),
      parsed AS (
        SELECT *, split_part(url, '/', 3) AS host,
               CAST(regexp_extract(split_part(url, '/', 3), 'h([0-9]+)', 1) AS BIGINT) AS hostnum
        FROM urls),
      blocked AS (SELECT DISTINCT host FROM parsed WHERE hostnum % 5 = 0)
      SELECT host,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             count(DISTINCT source) AS n_sources
      FROM parsed
      WHERE host NOT IN (SELECT host FROM blocked)
      GROUP BY host ORDER BY host
    """.trim)
  )

  /** Common-token quality score — the two-pass global-statistics shape
    * (CCNet/RefinedWeb-style "fraction of tokens in the corpus head"):
    * pass 1 computes the corpus-wide top-8 token table (count desc,
    * token asc — a TOTAL order, so the head set is deterministic under
    * ties); pass 2 scores every document by the fraction of its tokens
    * that fall in that head, in integer ppm so the division is
    * hash-exact across engines.
    *
    * Scale shape: pass 1 is one map-side-combinable token count plus a
    * driver-bounded top-k (8 rows); pass 2 re-scans with the head table
    * BROADCAST — the corpus is never shuffled on token. This is the
    * canonical global-stats-then-broadcast pattern (same family as
    * q66's BM25 df table and q57's benchmark hash set).
    */
  val q69CommonTokens = QueryDef(
    "q69_common_tokens",
    (s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val toks = docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      val top = toks.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc)
        .limit(8)
        .select(col("w"), lit(1L).as("in_head"))
      toks.join(broadcast(top), Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("in_head"), lit(0L))).as("n_common"))
        .select(col("doc_id"), col("n_tokens"), col("n_common"),
          expr("(n_common * 1000000) div n_tokens").as("common_ppm"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents),
      top AS (
        SELECT w FROM (
          SELECT w, count(*) AS c FROM toks GROUP BY w
          ORDER BY c DESC, w ASC LIMIT 8)),
      per AS (
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(CASE WHEN w IN (SELECT w FROM top) THEN 1 ELSE 0 END) AS BIGINT) AS n_common
        FROM toks GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_common,
             (n_common * 1000000) // n_tokens AS common_ppm
      FROM per ORDER BY doc_id
    """.trim)
  )

  /** Corpus-trained bigram language-model fluency score — the LM-filter
    * stage of the CCNet pipeline (Wenzek et al. 2020 §3.3 use a KenLM
    * 5-gram; the reduced-order twin here trains the n-gram table FROM
    * the corpus in the same job, the standard bootstrap when no
    * external model artifact is allowed). Each document is scored by
    * the mean conditional bigram probability P(w2|w1) = c(w1 w2)/c(w1)
    * over its adjacent token pairs, in integer ppm (floor division
    * twice) so the score is hash-exact across engines — a fluent
    * document re-uses corpus-frequent continuations and scores high;
    * shuffled/garbage text scores near the uniform floor.
    *
    * Scale shape: bigram derivation is MAP-ONLY (one transform over the
    * token array — never a self-join on position); the two count
    * tables are map-side-combinable aggregations; scoring re-joins the
    * bigram stream on (w1,w2) and w1 — skewed toward stopword keys,
    * but both probe sides are pre-aggregated counts so AQE's skew
    * split applies cleanly. At 100 TB the trained tables are a model
    * artifact: frozen once, then BROADCAST into every later scoring
    * pass (the q57/q69 pattern) instead of re-joined by shuffle.
    */
  val q70LmScore = QueryDef(
    "q70_lm_score",
    (s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("a"))
      val bigrams = docs.filter(size(col("a")) >= 2)
        .select(col("doc_id"),
          explode(expr(
            "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i + 1] AS w2))"))
            .as("g"))
        .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
      val uni = docs.select(explode(col("a")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1"))
      val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val per = bigrams
        .join(bi, Seq("w1", "w2"))
        .join(uni, Seq("w1"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(expr("(c12 * 1000000) div c1")).as("sum_ppm"))
      docs.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("sum_ppm"), lit(0L)).as("sum_ppm"),
          when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0L))
            .otherwise(expr("sum_ppm div n_bigrams")).as("fluency_ppm"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents),
      bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(a)), i -> {'w1': a[i], 'w2': a[i+1]})) AS g
        FROM t),
      b AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM bg),
      u AS (SELECT unnest(a) AS w1 FROM t),
      uc AS (SELECT w1, count(*) AS c1 FROM u GROUP BY w1),
      bc AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
      sc AS (
        SELECT b.doc_id, (bc.c12 * 1000000) // uc.c1 AS p_ppm
        FROM b JOIN bc USING (w1, w2) JOIN uc USING (w1)),
      per AS (
        SELECT doc_id, count(*) AS n_bigrams, CAST(sum(p_ppm) AS BIGINT) AS sum_ppm
        FROM sc GROUP BY doc_id)
      SELECT d.doc_id,
             coalesce(per.n_bigrams, 0) AS n_bigrams,
             coalesce(per.sum_ppm, 0) AS sum_ppm,
             CASE WHEN coalesce(per.n_bigrams, 0) = 0 THEN 0
                  ELSE per.sum_ppm // per.n_bigrams END AS fluency_ppm
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
      ORDER BY d.doc_id
    """.trim)
  )

  /** URL canonicalization + canonical-URL dedup — the first dedup any
    * crawl processor runs (before any content hashing): the same page
    * is fetched under scheme/case/www/port/tracking-param/fragment
    * variants, and grouping by the CANONICAL form collapses them
    * without reading a byte of body text.
    *
    * Messy URLs are synthesized deterministically inside the query on
    * both engines (q68 fixture pattern — the corpus has no url column):
    * doc_id residues drive scheme (http/https), www. prefix, host
    * case, an explicit :443 port, a trailing slash, utm_ and ref query
    * params, and a #fragment, over a shared path id doc_id mod 211 so
    * true duplicate groups occur at every multiplicity.
    *
    * Canonical rule (the parse path is what production runs): force
    * https, lowercase the HOST ONLY (path/query case is preserved),
    * strip :443 and a leading www., drop the fragment, remove tracking
    * params — the utm_ namespace (digits/underscores included, so
    * utm_id/utm_source_platform match) plus the click ids fbclid/
    * gclid/msclkid — keeping data-carrying ones like ref, repair the leftover
    * '?'/'&' seam, strip the trailing path slash. All regexes live in
    * the shared Java∩RE2 dialect (no lookaround).
    *
    * Scale shape: canonicalization is a pure map-only projection; the
    * keep-first verdict is ONE shuffle on the canonical key (min
    * doc_id per group — map-side combinable as groupBy-min + join in
    * the production variant). Nothing is all-pairs; host-level skew on
    * the canon key is the q48 salting case if a single URL dominates.
    */
  val q71UrlCanon = QueryDef(
    "q71_url_canon",
    (s, dir) => {
      val gen = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), (col("doc_id") % 211).cast("long").as("pid"))
        .withColumn("hostfull",
          when(col("doc_id") % 5 === 0, lit("EXAMPLE-CDN.COM"))
            .otherwise(lit("example-cdn.com")))
        .withColumn("url", concat(
          when(col("doc_id") % 2 === 0, lit("https")).otherwise(lit("http")),
          lit("://"),
          when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
          col("hostfull"),
          when(col("doc_id") % 7 === 0, lit(":443")).otherwise(lit("")),
          lit("/articles/"), col("pid").cast("string"),
          when(col("doc_id") % 11 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 4 === 1, lit("?utm_source=feed"))
            .when(col("doc_id") % 4 === 2,
              concat(lit("?ref="), (col("pid") % 7).cast("string")))
            .when(col("doc_id") % 4 === 3,
              concat(lit("?utm_campaign=x&ref="), (col("pid") % 7).cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit("#sec-2")).otherwise(lit(""))))
      val parsed = gen
        .withColumn("rest", regexp_replace(col("url"), "^https?://", ""))
        .withColumn("hostport", split(col("rest"), "/").getItem(0))
        .withColumn("pq", expr("substring(rest, length(hostport) + 1)"))
        .withColumn("host",
          regexp_replace(regexp_replace(lower(col("hostport")), ":443$", ""), "^www\\.", ""))
        .withColumn("pq2",
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(regexp_replace(col("pq"), "#.*$", ""),
                    "[?&](utm_[a-z0-9_]+|fbclid|gclid|msclkid)=[^&#]*", ""),
                  "^([^?&]*)&", "$1?"),
                "[?&]$", ""),
              "/\\?", "?"),
            "/$", ""))
        .withColumn("canon", concat(lit("https://"), col("host"), col("pq2")))
      val byCanon = Window.partitionBy(col("canon"))
      parsed
        .withColumn("keep", (col("doc_id") === min(col("doc_id")).over(byCanon)).cast("int"))
        .withColumn("n_dups", count(lit(1)).over(byCanon))
        .select(col("doc_id"), col("url"), col("canon"), col("keep"), col("n_dups"))
        .orderBy("doc_id")
    },
    Some("""
      WITH gen AS (
        SELECT doc_id, doc_id % 211 AS pid,
               CASE WHEN doc_id % 5 = 0 THEN 'EXAMPLE-CDN.COM' ELSE 'example-cdn.com' END AS hostfull
        FROM documents),
      urls AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END) || '://'
               || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
               || hostfull
               || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)
               || '/articles/' || pid
               || (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END)
               || (CASE doc_id % 4
                     WHEN 1 THEN '?utm_source=feed'
                     WHEN 2 THEN '?ref=' || (pid % 7)
                     WHEN 3 THEN '?utm_campaign=x&ref=' || (pid % 7)
                     ELSE '' END)
               || (CASE WHEN doc_id % 13 = 0 THEN '#sec-2' ELSE '' END) AS url
        FROM gen),
      parsed AS (
        SELECT doc_id, url,
               regexp_replace(url, '^https?://', '') AS rest
        FROM urls),
      hp AS (
        SELECT doc_id, url, rest,
               split_part(rest, '/', 1) AS hostport,
               substring(rest, len(split_part(rest, '/', 1)) + 1) AS pq
        FROM parsed),
      canon AS (
        SELECT doc_id, url,
               'https://'
               || regexp_replace(regexp_replace(lower(hostport), ':443$', ''), '^www\.', '')
               || regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(
                            regexp_replace(pq, '#.*$', ''),
                            '[?&](utm_[a-z0-9_]+|fbclid|gclid|msclkid)=[^&#]*', '', 'g'),
                          '^([^?&]*)&', '\1?'),
                        '[?&]$', ''),
                      '/\?', '?', 'g'),
                    '/$', '') AS canon
        FROM hp)
      SELECT doc_id, url, canon,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canon) THEN 1 ELSE 0 END AS keep,
             count(*) OVER (PARTITION BY canon) AS n_dups
      FROM canon
      ORDER BY doc_id
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q68HostStats, q69CommonTokens, q70LmScore, q71UrlCanon)
}
