package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link-graph operators. Web-corpus pipelines rank hosts/pages by link
  * authority (Common Crawl publishes harmonic-centrality host ranks;
  * quality filters consume them) — the engine shape is the ITERATIVE
  * JOIN: ranks ⋈ edges per round, the same round-bounded pattern as
  * q38's connected components.
  */
object GraphQueries {

  /** PageRank, integer-exact. Floating-point PageRank cannot be
    * hash-compared across engines (summation order), so ranks are kept
    * in integer units of 1e-12 and every step uses only BIGINT
    * arithmetic both engines define identically on non-negatives:
    * `div` truncation for the out-degree split and the damping factor
    * (0.85 as ·85 div 100). Three fixed rounds — the audit shape;
    * production runs to a tolerance.
    *
    * The edge list is synthesized deterministically INSIDE the query
    * (both engines build the same graph): each doc links to
    * (doc_id²·31 + 7k) mod N for k = 1..3 — quadratic, so the map is
    * NON-bijective and in-degrees skew (an affine map would be a
    * bijection and collapse PageRank to uniform), no external data.
    *
    * Scale shape: each round is one join edges⋈ranks shuffled on src
    * plus one aggregation on dst — the textbook distributed PageRank;
    * rounds are data-independent so lineage is truncated per round
    * (localCheckpoint, the q38 lineage-bomb lesson) even though three
    * rounds would survive without it. Bounded driver state: only the
    * node count N (parquet footer metadata) reaches the driver.
    */
  val q63Pagerank = QueryDef(
    "q63_pagerank",
    (s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val n = docs.count() // footer metadata, no scan
      val edges = docs
        .select(col("doc_id").as("src"),
          explode(array((1 to 3).map(k =>
            pmod(col("doc_id") * col("doc_id") * 31L + k * 7L, lit(n))): _*)).as("dst"))
        .localCheckpoint()
      var ranks = docs.select(col("doc_id"), lit(1000000000000L).as("rank"))
      // ranks/contrib are node-count rows (≪ the edge list, and tiny
      // beside the 8 GB broadcast cap at any bench sf): explicit
      // broadcast hints — the checkpointed intermediates carry no size
      // stats, so without the hint the planner falls back to
      // shuffle joins of the edge list every round (guide §3.1)
      for (_ <- 1 to 3) {
        val contrib = edges.join(broadcast(ranks), edges("src") === ranks("doc_id"))
          .select(col("dst"), expr("rank div 3").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("in_sum"))
        ranks = docs
          .join(broadcast(contrib), docs("doc_id") === contrib("dst"), "left")
          .select(docs("doc_id"),
            expr("150000000000L + (coalesce(in_sum, 0L) * 85L) div 100L").as("rank"))
          .localCheckpoint()
      }
      ranks.orderBy("doc_id")
    },
    Some("""
      WITH n AS (SELECT count(*) AS n FROM documents),
      e AS (
        SELECT doc_id AS src, (doc_id * doc_id * 31 + 7 * k) % (SELECT n FROM n) AS dst
        FROM documents, (SELECT unnest(generate_series(1, 3)) AS k)),
      r0 AS (SELECT doc_id, CAST(1000000000000 AS BIGINT) AS rank FROM documents),
      c1 AS (SELECT e.dst, sum(r0.rank // 3) AS in_sum FROM e JOIN r0 ON e.src = r0.doc_id GROUP BY e.dst),
      r1 AS (SELECT d.doc_id, CAST(150000000000 + coalesce(c1.in_sum, 0) * 85 // 100 AS BIGINT) AS rank
             FROM documents d LEFT JOIN c1 ON d.doc_id = c1.dst),
      c2 AS (SELECT e.dst, sum(r1.rank // 3) AS in_sum FROM e JOIN r1 ON e.src = r1.doc_id GROUP BY e.dst),
      r2 AS (SELECT d.doc_id, CAST(150000000000 + coalesce(c2.in_sum, 0) * 85 // 100 AS BIGINT) AS rank
             FROM documents d LEFT JOIN c2 ON d.doc_id = c2.dst),
      c3 AS (SELECT e.dst, sum(r2.rank // 3) AS in_sum FROM e JOIN r2 ON e.src = r2.doc_id GROUP BY e.dst),
      r3 AS (SELECT d.doc_id, CAST(150000000000 + coalesce(c3.in_sum, 0) * 85 // 100 AS BIGINT) AS rank
             FROM documents d LEFT JOIN c3 ON d.doc_id = c3.dst)
      SELECT doc_id, rank FROM r3 ORDER BY doc_id
    """.trim)
  )

  /** PageRank over the REAL extracted link graph — the composition the
    * r5 verdict asked for: qx_outlinks' DOM-walked (page, href) stream
    * feeds the q63 integer-exact rank loop, and the resulting authority
    * is joined back onto the documents (per page family), the shape a
    * quality filter consumes (Common Crawl host ranks, SURVEY §2.11).
    *
    * Graph: nodes are resolved URLs — the synthetic crawl's pages plus
    * their link targets (site-relative hrefs resolved against the page
    * origin; the corpus is single-host, so the page/section level is
    * where the in-degree skew lives: nav/footer hubs like `/cat/k`
    * accumulate authority exactly like host-level chrome does at crawl
    * scale). Edges are DISTINCT (page, target) pairs; out-degree is the
    * page's real distinct-target count (q63 used a fixed fan-out).
    * Same integer-exact arithmetic as q63 but in 1e-6 units: every edge
    * lands on one of the ~25 hub nodes, so a hub's rank approaches
    * N·unit and the per-family sum over ~20·N edges must stay inside
    * BIGINT under ANSI mode (1e-12 units would overflow at sf0.1).
    *
    * Oracle: the live side re-extracts anchors at session parallelism;
    * DuckDB replays the identical edge derivation + 3-round chain over
    * the independently materialized 7-partition outlink pass — gating
    * cross-parallelism determinism of the walk AND both engines'
    * agreement on the whole rank recursion.
    *
    * Scale shape: one distinct on (src,dst) — compact after the per-page
    * anchor dedup; each round joins edges⋈ranks on src (both shuffled on
    * the same key, so AQE reuses the exchange) and aggregates on dst
    * with map-side combine absorbing the hub skew; localCheckpoint per
    * round truncates lineage (q38 lesson). Driver state: nothing but
    * Spark's plans.
    */
  val q72LinkRank = QueryDef(
    "q72_link_rank",
    (s, dir) => {
      import s.implicits._
      ExtractQueries.materializeOutlinks(s, dir)
      val links = graft.gen.SyntheticCorpus
        .generate(s, ExtractQueries.corpusSize(dir))
        .mapPartitions(_.flatMap { r =>
          graft.extract.Outlinks.extract(r.html).map(l => (r.url, l.href))
        })
        .toDF("url", "href")
      val rawEdges = links
        .select(col("url").as("src"),
          when(col("href").startsWith("/"),
            concat(regexp_extract(col("url"), "^(https?://[^/]+)", 1), col("href")))
            .otherwise(col("href")).as("dst"))
      // Sparse rank state (provably equivalent to a dense node table,
      // with no data assumption): by the update rule, a node with NO
      // in-edges has rank exactly 150000 after every round (coalesce of
      // a NULL in_sum) and 1000000 at init — a constant. So the only
      // per-node state worth carrying is the in-linked nodes' ranks
      // (the contrib keys); every other node's rank is the round's base
      // constant, supplied via coalesce at the one place ranks are read
      // (the src side of the contribution join). This removes the
      // union+distinct node table (two passes + a shuffle over 2·|E|
      // url strings) and shrinks the per-round broadcast from
      // node-count rows to in-linked-count rows.
      // ONE shuffle builds the whole edge state (was two full edge
      // shuffles + a checkpointed join whose build side AQE picked
      // WRONG — it broadcast the full 416k-row URL edge list, ~88 MiB
      // estimated, over the 10.8 MiB degree aggregate;
      // plans/r07/q72_link_rank_rounds_before.txt execution 3).
      // Hash-partitioning on src alone co-locates every duplicate
      // (src,dst) pair AND every row of a src group, so the explicit
      // repartition satisfies the clustered distribution of both the
      // distinct and the out-degree window — EnsureRequirements inserts
      // no further Exchange (guide §2.1/§2.2: partial matching of the
      // required clustering; the rounds_after plan shows one Exchange
      // total). No size estimate, no driver round-trip; at crawl scale
      // neither edge endpoints nor per-src degrees fit a broadcast —
      // partition-local dedup + counting is the shape that survives.
      val edgesOd = rawEdges
        .repartition(col("src"))
        .dropDuplicates("src", "dst")
        .withColumn("od", count(lit(1)).over(Window.partitionBy("src")))
        .localCheckpoint()
      val edges = edgesOd.select("src", "dst")
      var dstRanks: Option[org.apache.spark.sql.DataFrame] = None
      var base = 1000000L
      for (_ <- 1 to 3) {
        val withRank = dstRanks match {
          case None => edgesOd.withColumn("rank", lit(base))
          case Some(dr) => edgesOd
            .join(broadcast(dr), col("src") === col("node"), "left")
            .select(col("src"), col("dst"), col("od"),
              coalesce(col("rank"), lit(base)).as("rank"))
        }
        val contrib = withRank
          .select(col("dst"), expr("rank div od").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("in_sum"))
        dstRanks = Some(contrib
          .select(col("dst").as("node"),
            expr("150000L + (coalesce(in_sum, 0L) * 85L) div 100L").as("rank"))
          .localCheckpoint())
        base = 150000L
      }
      // join authority back onto the documents: per page family, the
      // total rank mass of the pages' distinct link targets — the
      // quality-filter feed (pages linking into high-authority hubs).
      // Every dst has in-edges by definition, so dstRanks covers the
      // join completely.
      edges
        .join(broadcast(dstRanks.get), edges("dst") === col("node"))
        .select(split(col("src"), "/").getItem(3).as("family"),
          col("src"), col("rank"))
        .groupBy("family")
        .agg(countDistinct(col("src")).as("n_pages"),
          count(lit(1)).as("n_edges"),
          sum(col("rank")).as("authority_sum"))
        .orderBy("family")
    },
    Some(s"""
      WITH e AS (
        SELECT DISTINCT url AS src,
               CASE WHEN href LIKE '/%' THEN regexp_extract(url, '^(https?://[^/]+)', 1) || href
                    ELSE href END AS dst
        FROM read_parquet('${ExtractQueries.outlinksCachePath}/*.parquet')),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
      od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
      c1 AS (SELECT e.dst, sum(r0.rank // od.od) AS in_sum
             FROM e JOIN od ON e.src = od.src JOIN r0 ON e.src = r0.node GROUP BY e.dst),
      r1 AS (SELECT n.node, CAST(150000 + coalesce(c1.in_sum, 0) * 85 // 100 AS BIGINT) AS rank
             FROM nodes n LEFT JOIN c1 ON n.node = c1.dst),
      c2 AS (SELECT e.dst, sum(r1.rank // od.od) AS in_sum
             FROM e JOIN od ON e.src = od.src JOIN r1 ON e.src = r1.node GROUP BY e.dst),
      r2 AS (SELECT n.node, CAST(150000 + coalesce(c2.in_sum, 0) * 85 // 100 AS BIGINT) AS rank
             FROM nodes n LEFT JOIN c2 ON n.node = c2.dst),
      c3 AS (SELECT e.dst, sum(r2.rank // od.od) AS in_sum
             FROM e JOIN od ON e.src = od.src JOIN r2 ON e.src = r2.node GROUP BY e.dst),
      r3 AS (SELECT n.node, CAST(150000 + coalesce(c3.in_sum, 0) * 85 // 100 AS BIGINT) AS rank
             FROM nodes n LEFT JOIN c3 ON n.node = c3.dst)
      SELECT split_part(e.src, '/', 4) AS family,
             count(DISTINCT e.src) AS n_pages,
             count(*) AS n_edges,
             CAST(sum(r3.rank) AS BIGINT) AS authority_sum
      FROM e JOIN r3 ON e.dst = r3.node
      GROUP BY 1 ORDER BY family
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q63Pagerank, q72LinkRank)
}
