package graft.queries

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
      for (_ <- 1 to 3) {
        val contrib = edges.join(ranks, edges("src") === ranks("doc_id"))
          .select(col("dst"), expr("rank div 3").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("in_sum"))
        ranks = docs
          .join(contrib, docs("doc_id") === contrib("dst"), "left")
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

  val all: Seq[QueryDef] = Seq(q63Pagerank)
}
