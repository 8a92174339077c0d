package graft.queries

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

  val all: Seq[QueryDef] = Seq(q68HostStats, q69CommonTokens)
}
